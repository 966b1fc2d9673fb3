"""Small pure-Python text-matching primitives shared by the engine's
driver-side expansion paths (wildcard → regex translation for the
dictionary scan, bounded Levenshtein for fuzzy/percolation matching).

Lives in the PRODUCT package — the testing oracle imports from here,
never the other way around (the gate's independent correctness check
is the DuckDB SQL re-derivation, not these helpers)."""

from __future__ import annotations

import re


def wildcard_to_regex(pattern: str) -> str:
    """WildcardQuery surface → anchored-regex body (* → .*, ? → .,
    everything else literal — WildcardQuery.java:35-47 toAutomaton)."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "".join(out)


def osa_distance(a: str, b: str, bound: int) -> int:
    """Optimal-string-alignment (restricted Damerau-Levenshtein)
    distance with transposition of adjacent characters as a PRIMITIVE
    edit — the metric FuzzyQuery uses by default (FuzzyQuery.java:57
    defaultTranspositions=true; LevenshteinAutomata's transposition
    tables). Returns bound+1 once the distance provably exceeds
    ``bound``. osa(a,b) <= levenshtein(a,b) <= 2*osa(a,b) — callers
    pre-filter candidates with classic distance <= 2*bound."""
    if abs(len(a) - len(b)) > bound:
        return bound + 1
    prev2: list[int] | None = None
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            d = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            if (
                prev2 is not None
                and i > 1
                and j > 1
                and ca == b[j - 2]
                and a[i - 2] == cb
            ):
                d = min(d, prev2[j - 2] + 1)
            cur.append(d)
        if min(cur) > bound:
            return bound + 1
        prev2, prev = prev, cur
    return prev[-1] if prev[-1] <= bound else bound + 1


def levenshtein(a: str, b: str, bound: int) -> int:
    """Banded edit distance with early exit: returns bound+1 as soon as
    the distance provably exceeds ``bound`` (the LevenshteinAutomata
    acceptance role for driver-side candidate checks)."""
    if abs(len(a) - len(b)) > bound:
        return bound + 1
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        if min(cur) > bound:
            return bound + 1
        prev = cur
    return prev[-1]
