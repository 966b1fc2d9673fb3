"""StandardAnalyzer-equivalent tokenization (UAX#29 word break subset).

Reference semantics (all under /root/reference/):
- lucene/core/src/java/org/apache/lucene/analysis/standard/StandardAnalyzer.java:50-53,84-97
  — pipeline = StandardTokenizer → LowerCaseFilter → StopFilter with an
  EMPTY default stopword set (CharArraySet.EMPTY_SET), so by default no
  stopwords are removed. We match that default.
- lucene/core/src/java/org/apache/lucene/analysis/standard/StandardTokenizerImpl.jflex:211-252
  — UAX#29 word-break rules. A word token is a sequence of letter runs
  and digit runs (WB5/8/9/10) where:
    * MidLetter ∪ MidNumLet ∪ Single_Quote join letter–letter (WB6/7),
    * MidNum ∪ MidNumLet ∪ Single_Quote join digit–digit (WB11/12),
    * ExtendNumLet (e.g. ``_``) glues at edges and between runs (WB13a/b).
- lucene/core/src/java/org/apache/lucene/analysis/standard/StandardTokenizer.java:152-166
  — tokens longer than maxTokenLength (default 255) are DROPPED, not
  chopped; the skipped token still consumes a position.

Scope: letter/number word rules over all Unicode letters/digits, plus
single-codepoint CJK ideograph/hiragana tokens. Not implemented (out of
fixture scope, documented): emoji sequences, regional indicators,
Hebrew double-quote rules, SE-Asian segmentation, Extend/Format/ZWJ
absorption. The fixture corpus (source code) exercises none of these.

Everything is vectorized: the hot path is ``tokenize_series`` running
``re.findall`` over a pandas Series inside an Arrow-batched pandas UDF —
no per-row Python in the Spark plan (input_hint requirement).
"""

from __future__ import annotations

import re

import pandas as pd

MAX_TOKEN_LENGTH = 255  # StandardTokenizer.java:39-60 (DEFAULT_MAX_TOKEN_LENGTH)

# ASCII + BMP members of the UAX#29 classes we implement
# (Unicode 12.1 WordBreakProperty.txt values, as used by Lucene 9's grammar).
_SINGLE_QUOTE = "'"
_MID_LETTER = ":··״‧︓﹕："
_MID_NUM_LET = ".‘’․﹒＇．"
_MID_NUM = ",;;։،؍٬߸⁄︐︔﹐﹔，；"
_EXTEND_NUM_LET = "_ ‿⁀⁔︳︴﹍﹎﹏＿"

_L_JOIN = re.escape(_MID_LETTER + _MID_NUM_LET + _SINGLE_QUOTE)
_N_JOIN = re.escape(_MID_NUM + _MID_NUM_LET + _SINGLE_QUOTE)
_ENL = re.escape(_EXTEND_NUM_LET)

# CJK single-char token types (IDEOGRAPHIC / HIRAGANA): one token per char.
_CJK = "一-鿿㐀-䶿豈-﫿ぁ-ゖ"

# L = any Unicode letter (approximates WB:ALetter ∪ Hebrew_Letter for our
# scope), N = any Unicode decimal digit (WB:Numeric). CJK chars are
# excluded from L because they are not ALetter — they tokenize per-char.
_L = rf"[^\W\d_{_ENL}{_CJK}]"
_N = r"\d"
# A run must contain at least one letter/digit: bare ExtendNumLet ("___")
# is not a word per the grammar (StandardTokenizerImpl.jflex:238-252 —
# every alternative requires a letter/numeric/katakana core).
_RUN = rf"[{_ENL}]*(?:{_L}|{_N})(?:{_L}|{_N}|[{_ENL}])*"
_JOINER = rf"(?:(?<={_L})[{_L_JOIN}](?={_L})|(?<={_N})[{_N_JOIN}](?={_N}))"

_TOKEN_RE = re.compile(rf"{_RUN}(?:{_JOINER}{_RUN})*|[{_CJK}]")


def _raw_tokens(text: str) -> list[str]:
    return _TOKEN_RE.findall(text)


# EnglishAnalyzer's default stop set (EnglishAnalyzer.java:43-53,
# ENGLISH_STOP_WORDS_SET — the classic 33-word list, matched
# case-insensitively post-LowerCaseFilter).
ENGLISH_STOP_WORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or "
    "such that the their then there these they this to was will with".split()
)

_APOS = "'’＇"  # ', ’, ＇ (EnglishPossessiveFilter.java:40-48)


def _strip_possessive(t: str) -> str:
    """EnglishPossessiveFilter (EnglishPossessiveFilter.java:38-52):
    strip a trailing <apostrophe>s / <apostrophe>S."""
    if len(t) >= 2 and t[-2] in _APOS and (t[-1] == "s" or t[-1] == "S"):
        return t[:-2]
    return t


def _emitter(stem):
    """Analyzer filter chain AFTER the tokenizer, as one
    token → (token | None) function; None = token removed but still
    consuming a position (StopFilter position-increment contract).

    ``stem`` selects the analyzer (the IndexConfig.analyzer value;
    bools are the legacy spelling):
    - False / "standard": StandardAnalyzer — lowercase only
      (StandardAnalyzer.java:50-53, empty default stop set)
    - True / "porter": standard + PorterStemFilter
    - "english": EnglishAnalyzer.createComponents
      (EnglishAnalyzer.java:102-110) — EnglishPossessiveFilter →
      LowerCaseFilter → StopFilter(ENGLISH_STOP_WORDS_SET) →
      PorterStemFilter (no stem-exclusion set)

    Returns None for the standard chain so hot paths keep their
    branch-free vectorized form."""
    if stem in (False, None, "standard"):
        return None
    from lucene_spark.analysis.porter import porter_stem

    if stem in (True, "porter"):
        return lambda t: porter_stem(t.lower())
    if stem == "english":

        def emit(t: str):
            t = _strip_possessive(t).lower()
            if t in ENGLISH_STOP_WORDS:
                return None
            return porter_stem(t)

        return emit
    raise ValueError(f"unknown analyzer: {stem!r}")


def tokenize(text: str, max_token_length: int = MAX_TOKEN_LENGTH, stem: bool = False) -> list[str]:
    """Analyze ``text``: UAX#29 words → drop >255 → the ``stem``
    analyzer chain (standard lowercase / porter / english — see
    :func:`_emitter`). Stop-removed tokens are dropped from the output
    (positions are only tracked by the *_positions variants)."""
    out = [t for t in _raw_tokens(text) if len(t) <= max_token_length]
    em = _emitter(stem)
    if em is None:
        return [t.lower() for t in out]
    return [r for r in (em(t) for t in out) if r is not None]


def tokenize_with_positions(
    text: str, max_token_length: int = MAX_TOKEN_LENGTH
) -> tuple[list[str], list[int]]:
    """Tokens plus Lucene positions (dropped over-length tokens still
    consume a position — StandardTokenizer.java:158-166)."""
    toks, positions = [], []
    for pos, t in enumerate(_raw_tokens(text)):
        if len(t) <= max_token_length:
            toks.append(t.lower())
            positions.append(pos)
    return toks, positions


def tokenize_pos_off_series(
    texts: pd.Series, max_token_length: int = MAX_TOKEN_LENGTH, stem: bool = False
) -> tuple[pd.Series, pd.Series, pd.Series, pd.Series]:
    """Batch tokenization with positions AND char offsets (the
    IndexOptions.DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS analyzer
    contract, IndexOptions.java:29-50 / OffsetAttribute): returns
    (tokens, positions, starts, ends) Series of equal-length lists.
    Offsets index the ORIGINAL text (lowercasing and stemming never
    move offsets — both filters are offset-preserving)."""
    em = _emitter(stem)
    toks_out, pos_out, st_out, en_out = [], [], [], []
    for text in texts.fillna(""):
        toks, poss, sts, ens = [], [], [], []
        for p, m in enumerate(_TOKEN_RE.finditer(text)):
            t = m.group()
            if len(t) <= max_token_length:
                r = em(t) if em else t.lower()
                if r is None:  # stop-removed: consumes position only
                    continue
                toks.append(r)
                poss.append(p)
                sts.append(m.start())
                ens.append(m.end())
        toks_out.append(toks)
        pos_out.append(poss)
        st_out.append(sts)
        en_out.append(ens)
    idx = texts.index
    return (
        pd.Series(toks_out, index=idx),
        pd.Series(pos_out, index=idx),
        pd.Series(st_out, index=idx),
        pd.Series(en_out, index=idx),
    )


def tokenize_series(
    texts: pd.Series, max_token_length: int = MAX_TOKEN_LENGTH, stem: bool = False
) -> pd.Series:
    """Vectorized batch tokenization for pandas UDFs (Arrow path)."""
    # str.findall is the pandas-vectorized regex scan; the lowercase +
    # length filter runs on the token lists (tiny vs the regex cost).
    raw = texts.fillna("").str.findall(_TOKEN_RE)
    em = _emitter(stem)
    if em:
        return raw.map(
            lambda ts: [
                r for t in ts if len(t) <= max_token_length if (r := em(t)) is not None
            ]
        )
    if max_token_length is None:
        return raw.map(lambda ts: [t.lower() for t in ts])
    return raw.map(lambda ts: [t.lower() for t in ts if len(t) <= max_token_length])


def tokenize_pos_series(
    texts: pd.Series, max_token_length: int = MAX_TOKEN_LENGTH, stem: bool = False
) -> tuple[pd.Series, pd.Series]:
    """Batch tokenization with Lucene positions (dropped over-length
    tokens still consume a position increment). Returns (tokens,
    positions) Series of equal-length lists."""
    raw = texts.fillna("").str.findall(_TOKEN_RE)
    em = _emitter(stem)
    toks_out, pos_out = [], []
    for ts in raw:
        toks, poss = [], []
        for p, t in enumerate(ts):
            if len(t) <= max_token_length:
                r = em(t) if em else t.lower()
                if r is None:  # stop-removed: consumes position only
                    continue
                toks.append(r)
                poss.append(p)
        toks_out.append(toks)
        pos_out.append(poss)
    return pd.Series(toks_out, index=texts.index), pd.Series(pos_out, index=texts.index)
