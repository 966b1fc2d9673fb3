"""WordBreakSpellChecker vs from-definition brute force.

Reference: lucene/suggest/src/java/org/apache/lucene/search/spell/
WordBreakSpellChecker.java — suggestWordBreaks (:71-123 queue +
:244-299 recursive split lattice; a suggestion = a split where every
part's docFreq >= minSuggestionFrequency, ranked by number of breaks
then max/summed part frequency) and suggestWordCombinations (:145-236 —
adjacent runs combined into one dictionary word; the default
SUGGEST_WHEN_NOT_IN_INDEX mode needs at least one constituent absent,
minFreq == 0 at :205). Test shapes mirror TestWordBreakSpellChecker.
"""

from __future__ import annotations

from collections import Counter

import pytest

from lucene_spark.analysis.tokenizer import tokenize
from lucene_spark.search.suggest import word_breaks, word_combinations


@pytest.fixture(scope="module")
def dfs(corpus_pdf):
    """term → docFreq over the fixture corpus (the dictionary)."""
    c: Counter = Counter()
    for text in corpus_pdf["content"]:
        c.update(set(tokenize(text)))
    return c


def _brute_breaks(dfs, term, max_changes=1, min_len=1, min_freq=1, sort="max", k=5):
    out = []

    def rec(rest, parts, breaks):
        for i in range(min_len, len(rest) - min_len + 1):
            cand = parts + (rest[:i], rest[i:])
            if all(dfs.get(p, 0) >= min_freq for p in cand):
                agg = max if sort == "max" else sum
                out.append((" ".join(cand), breaks + 1, agg(dfs.get(p, 0) for p in cand)))
            if breaks + 1 < max_changes:
                rec(rest[i:], parts + (rest[:i],), breaks + 1)

    if dfs.get(term, 0) > 0:  # SUGGEST_WHEN_NOT_IN_INDEX
        return []
    rec(term, (), 0)
    out.sort(key=lambda r: (r[1], -r[2], r[0]))
    return out[:k]


def _pick_pair(dfs):
    """Two common dictionary terms whose concatenation is NOT a term."""
    common = [t for t, f in dfs.most_common(20) if t.isalpha() and len(t) >= 2]
    for a in common:
        for b in common:
            if a != b and (a + b) not in dfs:
                return a, b
    raise AssertionError("no pair found")


def test_word_breaks_matches_brute(search_index, dfs):
    a, b = _pick_pair(dfs)
    got = [tuple(r) for r in word_breaks(search_index, a + b, k=5).collect()]
    want = _brute_breaks(dfs, a + b, k=5)
    assert got == want
    assert (a + " " + b) in [g[0] for g in got]


def test_word_breaks_two_changes(search_index, dfs):
    a, b = _pick_pair(dfs)
    c = next(t for t, f in dfs.most_common(30) if t.isalpha() and t not in (a, b))
    term = a + b + c
    if dfs.get(term, 0) > 0:
        pytest.skip("triple is a real term")
    got = [tuple(r) for r in word_breaks(search_index, term, k=8, max_changes=2).collect()]
    want = _brute_breaks(dfs, term, max_changes=2, k=8)
    assert got == want
    # the 2-break split is present and sorts after any 1-break split
    assert (" ".join((a, b, c)), 2, max(dfs[a], dfs[b], dfs[c])) in got


def test_word_breaks_in_index_returns_nothing(search_index, dfs):
    term = dfs.most_common(1)[0][0]
    assert word_breaks(search_index, term, k=5).count() == 0


def test_word_breaks_min_freq_and_summed_sort(search_index, dfs):
    a, b = _pick_pair(dfs)
    hi = max(dfs.values())
    got = [
        tuple(r)
        for r in word_breaks(
            search_index, a + b, k=5, min_suggestion_freq=hi + 1
        ).collect()
    ]
    assert got == []
    got_sum = [tuple(r) for r in word_breaks(search_index, a + b, k=5, sort="sum").collect()]
    want_sum = _brute_breaks(dfs, a + b, k=5, sort="sum")
    assert got_sum == want_sum


def test_word_combinations(search_index, dfs):
    a, b = _pick_pair(dfs)
    # split a into two non-term halves -> combining restores it
    h1, h2 = a[: len(a) // 2], a[len(a) // 2 :]
    if dfs.get(h1, 0) or dfs.get(h2, 0):
        pytest.skip("halves are real terms")
    got = [tuple(r) for r in word_combinations(search_index, [h1, h2, b], k=5).collect()]
    assert (a, 0, 1, 1, dfs[a]) in got
    # (h2 + b) is a combination only if it's a dictionary word
    for sugg, *_ in got:
        assert dfs.get(sugg, 0) >= 1


def test_word_combinations_modes(search_index, dfs):
    a, b = _pick_pair(dfs)
    # both constituents present in the index -> when_not_in_index drops
    got = word_combinations(search_index, [a, b], k=5).collect()
    assert all(r["suggestion"] != a + b for r in got)
    # always mode keeps any dictionary combination
    h1, h2 = a[: len(a) // 2], a[len(a) // 2 :]
    got_always = [
        tuple(r) for r in word_combinations(search_index, [h1, h2], k=5, mode="always").collect()
    ]
    assert got_always == [(a, 0, 1, 1, dfs[a])]
