"""ShingleFilter / CommonGramsFilter — word n-grams as stacked tokens.

Reference semantics (all under /root/reference/lucene/analysis/common/):
- src/java/org/apache/lucene/analysis/shingle/ShingleFilter.java:30-120,
  261-300 — at each stream position emit the unigram (when
  ``output_unigrams``) followed by every shingle size min..max that
  fits, all at the SAME position (posInc 0 stacking); position holes
  (increment > 1) are filled with "_" filler tokens which participate
  in shingles (never emitted alone, and all-filler shingles are
  skipped, :271-291); shingle offsets span first-token start to
  last-token end, filler offsets collapse to the next real token's
  start.
- src/test/.../shingle/TestShingleFilter.java:36-180 — the golden
  token/posInc/offset expectations mirrored in tests/test_shingles.py.
- src/java/.../commongrams/CommonGramsFilter.java:37-60 — bigrams of
  adjacent pairs where EITHER word is a common word, joined with "_",
  stacked at the first word's position (posInc 0); unigrams always
  pass through.

Shape: pure functions over (tokens, positions, starts, ends) lists —
the stacked-token extension of the analyzer chain. The index builder
applies them inside the same Arrow-batched tokenize UDF (no extra
Spark stage); norms discount posInc-0 tokens (discountOverlaps=true,
Similarity.java computeNorm contract) while collection statistics
count every posting — exactly the reference's behavior for shingled
fields.
"""

from __future__ import annotations

FILLER = "_"
SEPARATOR = " "


def shingle_stream(
    tokens: list[str],
    positions: list[int],
    min_size: int = 2,
    max_size: int = 2,
    output_unigrams: bool = True,
    starts: list[int] | None = None,
    ends: list[int] | None = None,
    output_unigrams_if_no_shingles: bool = False,
):
    """(tokens, positions[, starts, ends]) → the shingled stacked
    stream as (tokens, positions, overlaps[, starts, ends]):
    ``overlaps`` marks posInc-0 tokens (True for every non-first output
    at a position) so norm computation can discount them. Positions are
    absolute (holes = missing values); fillers occupy hole positions
    inside shingles but are never emitted themselves."""
    if min_size < 2 or max_size < min_size:
        raise ValueError("shingle sizes need 2 <= min_size <= max_size")
    with_offsets = starts is not None
    # 1. densified window stream: real tokens + fillers at holes
    stream: list[tuple[str, int, bool, int, int]] = []
    prev = -1
    for i, (t, p) in enumerate(zip(tokens, positions)):
        s = starts[i] if with_offsets else 0
        e = ends[i] if with_offsets else 0
        for hp in range(prev + 1, p):
            stream.append((FILLER, hp, True, s, s))  # filler offsets = next real start
        stream.append((t, p, False, s, e))
        prev = p
    out_t: list[str] = []
    out_p: list[int] = []
    out_ov: list[bool] = []
    out_s: list[int] = []
    out_e: list[int] = []
    any_shingle = False
    for i, (t, p, is_filler, s, e) in enumerate(stream):
        first_here = True
        if output_unigrams and not is_filler:
            out_t.append(t)
            out_p.append(p)
            out_ov.append(False)
            out_s.append(s)
            out_e.append(e)
            first_here = False
        for size in range(min_size, max_size + 1):
            if i + size > len(stream):
                break
            window = stream[i : i + size]
            if all(w[2] for w in window):  # all-filler shingle: skip
                continue
            out_t.append(SEPARATOR.join(w[0] for w in window))
            out_p.append(p)
            # first output at a position consumes the position
            # increment; later outputs stack (posInc 0)
            out_ov.append(not first_here)
            first_here = False
            out_s.append(s)
            out_e.append(window[-1][4])
            any_shingle = True
    if not any_shingle and not output_unigrams and output_unigrams_if_no_shingles:
        real = [(t, p, f, s, e) for t, p, f, s, e in stream if not f]
        out_t = [w[0] for w in real]
        out_p = [w[1] for w in real]
        out_ov = [False] * len(real)
        out_s = [w[3] for w in real]
        out_e = [w[4] for w in real]
    if with_offsets:
        return out_t, out_p, out_ov, out_s, out_e
    return out_t, out_p, out_ov


def ngram_stream(
    tokens: list[str],
    positions: list[int],
    min_gram: int,
    max_gram: int,
    edge: bool = False,
    preserve_original: bool = False,
    starts: list[int] | None = None,
    ends: list[int] | None = None,
):
    """NGramTokenFilter / EdgeNGramTokenFilter (analysis/common/.../
    ngram/NGramTokenFilter.java:25-40, EdgeNGramTokenFilter.java:25-60):
    per input token emit every [min_gram, max_gram]-length gram —
    all substrings sorted by (offset-in-token, length) for the full
    filter, prefixes ascending for the edge filter — STACKED at the
    token's position (first output keeps the position increment, the
    rest are posInc 0). Offsets are NOT modified (whole-token spans,
    the post-4.4 contract). ``preserve_original`` keeps tokens whose
    length falls outside the gram range; otherwise such tokens emit
    nothing (their position increment carries forward, which absolute
    positions model for free)."""
    if min_gram < 1 or max_gram < min_gram:
        raise ValueError("need 1 <= min_gram <= max_gram")
    with_offsets = starts is not None
    out_t: list[str] = []
    out_p: list[int] = []
    out_ov: list[bool] = []
    out_s: list[int] = []
    out_e: list[int] = []
    for i, (t, p) in enumerate(zip(tokens, positions)):
        n = len(t)
        grams: list[str] = []
        if edge:
            if preserve_original and n < min_gram:
                grams.append(t)
            grams.extend(t[:g] for g in range(min_gram, min(max_gram, n) + 1))
            if preserve_original and n > max_gram:
                grams.append(t)
        else:
            if n < min_gram:
                if preserve_original:
                    grams.append(t)
            else:
                for off in range(n - min_gram + 1):
                    for g in range(min_gram, max_gram + 1):
                        if off + g > n:
                            break
                        grams.append(t[off : off + g])
                if preserve_original and n > max_gram:
                    grams.append(t)
        for j, g in enumerate(grams):
            out_t.append(g)
            out_p.append(p)
            out_ov.append(j > 0)
            if with_offsets:
                out_s.append(starts[i])
                out_e.append(ends[i])
    if with_offsets:
        return out_t, out_p, out_ov, out_s, out_e
    return out_t, out_p, out_ov


def common_grams_stream(
    tokens: list[str],
    positions: list[int],
    common_words,
    starts: list[int] | None = None,
    ends: list[int] | None = None,
):
    """CommonGramsFilter (CommonGramsFilter.java:37-60): every unigram
    passes through; each CONSECUTIVE-TOKEN pair where either word is in
    ``common_words`` additionally emits "first_second" (GRAM_TYPE,
    '_' separator) stacked at the FIRST word's position (gramToken:
    posInc=0, posLen=2). Pairs form between stream-adjacent tokens
    regardless of position holes — the reference buffers the previous
    term and never consults posInc for pair formation ("We build
    n-grams before and after stopwords", incrementToken:107-115)."""
    common = set(common_words)
    with_offsets = starts is not None
    out_t: list[str] = []
    out_p: list[int] = []
    out_ov: list[bool] = []
    out_s: list[int] = []
    out_e: list[int] = []
    n = len(tokens)
    for i, (t, p) in enumerate(zip(tokens, positions)):
        out_t.append(t)
        out_p.append(p)
        out_ov.append(False)
        if with_offsets:
            out_s.append(starts[i])
            out_e.append(ends[i])
        if i + 1 < n and (t in common or tokens[i + 1] in common):
            out_t.append(f"{t}_{tokens[i + 1]}")
            out_p.append(p)
            out_ov.append(True)
            if with_offsets:
                out_s.append(starts[i])
                out_e.append(ends[i + 1])
    if with_offsets:
        return out_t, out_p, out_ov, out_s, out_e
    return out_t, out_p, out_ov


def synonym_stream(
    tokens: list[str],
    positions: list[int],
    syn_map: dict[str, tuple[str, ...]],
    starts: list[int] | None = None,
    ends: list[int] | None = None,
):
    """Index-time SynonymGraphFilter + FlattenGraphFilter for
    single-token rules (analysis/common/.../synonym/SynonymGraphFilter
    .java:221-280 — synonym outputs are injected at the matched input's
    graph node, which flattening collapses to posInc 0 over the
    original; SynonymMap.Builder.add keepOrig=true / expand=true,
    SynonymMap.java:143-215): every occurrence of a mapped token also
    indexes its alternatives stacked at the same position, with the
    original's offsets. Single-token rules are exactly what survives
    index-time flattening losslessly (FlattenGraphFilter.java:51 —
    multi-word outputs lose their spans when flattened, which is why
    Lucene documents multi-word synonyms as a search-time filter).
    Output is the stacked-stream shape (tokens, positions, overlaps
    [, starts, ends]); stacked copies are the overlaps, so discounted
    norms count surface tokens only while collection statistics count
    every posting."""
    with_offsets = starts is not None
    out_t: list[str] = []
    out_p: list[int] = []
    out_o: list[bool] = []
    out_s: list[int] = []
    out_e: list[int] = []
    for i, (t, p) in enumerate(zip(tokens, positions)):
        out_t.append(t)
        out_p.append(p)
        out_o.append(False)
        if with_offsets:
            out_s.append(starts[i])
            out_e.append(ends[i])
        for alt in syn_map.get(t, ()):
            out_t.append(alt)
            out_p.append(p)
            out_o.append(True)
            if with_offsets:
                out_s.append(starts[i])
                out_e.append(ends[i])
    if with_offsets:
        return out_t, out_p, out_o, out_s, out_e
    return out_t, out_p, out_o


def build_synonym_map(groups) -> dict[str, tuple[str, ...]]:
    """Equivalence sets → token → stacked alternatives (SynonymMap
    expand=true: every member maps to every other member). Terms must
    be in post-analysis form (the builder lowercases them to match the
    standard chain). A term in several sets gets the deduplicated
    union of its alternatives."""
    out: dict[str, list[str]] = {}
    for group in groups:
        g = [str(t).lower() for t in group]
        if any(not t or any(c.isspace() for c in t) for t in g):
            raise ValueError(
                f"synonym terms must be single non-empty tokens: {group!r} "
                "(multi-word rules do not survive index-time graph flattening)"
            )
        g = list(dict.fromkeys(g))
        if len(g) < 2:
            raise ValueError(f"synonym set needs >= 2 distinct terms: {group!r}")
        for t in g:
            bucket = out.setdefault(t, [])
            for alt in g:
                if alt != t and alt not in bucket:
                    bucket.append(alt)
    return {t: tuple(alts) for t, alts in out.items()}


def stem_repeat_stream(
    tokens: list[str],
    positions: list[int],
    starts: list[int] | None = None,
    ends: list[int] | None = None,
):
    """KeywordRepeatFilter + PorterStemFilter + RemoveDuplicates
    (analysis/common/.../miscellaneous/KeywordRepeatFilter.java:28-44 —
    every token emitted twice, the keyword-marked original first, the
    stemmer's copy stacked at posInc 0; RemoveDuplicatesTokenFilter.java
    :30-60 drops the copy when stemming changed nothing): the standard
    Lucene recipe for exact-plus-stemmed matching in one field. Output
    is the stacked-stream shape (tokens, positions, overlaps[, starts,
    ends]); the stemmed copy is the overlap, so discounted norms count
    surface tokens only — exactly discountOverlaps over this chain."""
    from lucene_spark.analysis.porter import porter_stem

    with_offsets = starts is not None
    out_t: list[str] = []
    out_p: list[int] = []
    out_o: list[bool] = []
    out_s: list[int] = []
    out_e: list[int] = []
    for i, (t, p) in enumerate(zip(tokens, positions)):
        out_t.append(t)
        out_p.append(p)
        out_o.append(False)
        if with_offsets:
            out_s.append(starts[i])
            out_e.append(ends[i])
        st = porter_stem(t)
        if st != t:
            out_t.append(st)
            out_p.append(p)
            out_o.append(True)
            if with_offsets:
                out_s.append(starts[i])
                out_e.append(ends[i])
    if with_offsets:
        return out_t, out_p, out_o, out_s, out_e
    return out_t, out_p, out_o
