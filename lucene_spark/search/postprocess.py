"""Hit post-processing: facets + highlighting.

The reference treats these as separate modules (lucene/facet,
lucene/highlighter); SURVEY §2.5 maps them to aggregation / string ops
over the hits relation — which is exactly what they are here:

- facets = match the query (constant-score doc set), join the docs
  table, groupBy the facet column. Pure DataFrame ops; at scale the
  join is a broadcast of the hit set (top-k) or a semi-join (full
  match set).
- highlighting = windowed snippet extraction around matched terms,
  vectorized over a pandas UDF (the PostingsHighlighter role, minus
  passage ranking).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from lucene_spark.analysis.tokenizer import tokenize


def hits_frame(searcher, query, mode: str = "driver") -> DataFrame:
    """The scored match set as a (doc_id, score) DataFrame.

    mode="driver": interactive path — TopDocs hits lifted into a tiny
    local relation (broadcast-join side). mode="distributed": the
    engine's match_frame — per-chunk kernels emit every match and the
    relation NEVER materializes on the driver; this is the 100 TB shape
    for facets/grouping/rescoring over non-selective queries."""
    if mode == "distributed":
        return searcher.match_frame(query)
    matches = searcher.search(query, k=1_000_000_000)
    spark = searcher.index.spark
    return spark.createDataFrame(
        [(int(d), float(s)) for d, s in matches.hits], "doc_id bigint, score double"
    )


def _join_hits(docs_df: DataFrame, hits: DataFrame, mode: str) -> DataFrame:
    """Join the docs table to the hit relation: broadcast the hits in
    driver mode (small by construction); in distributed mode leave the
    strategy to Catalyst/AQE (the hit set can be O(corpus))."""
    h = F.broadcast(hits) if mode == "driver" else hits
    return docs_df.join(h, "doc_id")


def facet_counts(
    searcher, query, docs_df: DataFrame, facet_col: str, mode: str = "driver"
) -> DataFrame:
    """Counts of ``facet_col`` over ALL docs matching ``query``
    (lucene/facet FastTaxonomyFacetCounts role). Returns
    (facet value, cnt) sorted by cnt desc, value asc."""
    ids = hits_frame(searcher, query, mode).select("doc_id")
    return (
        _join_hits(docs_df, ids, mode)
        .groupBy(facet_col)
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc(facet_col))
    )


def facet_counts_sampled(
    searcher, query, docs_df: DataFrame, facet_col: str, fraction: float,
    mode: str = "driver",
) -> DataFrame:
    """Sampled facet counts — the RandomSamplingFacetsCollector role
    (lucene/facet RandomSamplingFacetsCollector.java:39-120 sampling
    collector; :170-215 amortizeFacetCounts scales the sampled counts
    back by 1/samplingRate). The reference draws its sample with a
    XORShift stream inside one collector; a distributed engine needs
    sample membership to be a pure FUNCTION of the doc so every
    executor, retry, and re-run draws the same docs — the deterministic
    md5-bucket idiom (pipeline/curation.py sample_deterministic).
    Returns (facet value, cnt, est): cnt over the sampled matches,
    est = round(cnt / fraction), the amortized estimate."""
    if not (0.0 < fraction <= 1.0):
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    from lucene_spark.pipeline.curation import sample_deterministic

    ids = hits_frame(searcher, query, mode).select("doc_id")
    sampled = sample_deterministic(ids, fraction)
    return (
        _join_hits(docs_df, sampled, mode)
        .groupBy(facet_col)
        .agg(F.count("*").alias("cnt"))
        .withColumn("est", F.round(F.col("cnt") / F.lit(float(fraction))).cast("long"))
        .orderBy(F.desc("cnt"), F.asc(facet_col))
    )


def sorted_search(
    searcher, query, docs_df: DataFrame, sort_cols, k: int = 10, mode: str = "driver",
    after: tuple | None = None,
) -> DataFrame:
    """Sort/SortField + TopFieldCollector role (SURVEY §2.3 sorted
    search): matches of ``query`` ordered by doc-table columns instead
    of relevance — ``ORDER BY ... LIMIT k``, which Catalyst executes as
    TakeOrderedAndProject (per-partition top-k + merge: the early
    termination the reference gets from index sorting). ``sort_cols``
    is a list of (col, ascending) pairs; doc_id asc is the final
    tie-break.

    ``after=(sort_values..., doc_id)`` pages like
    IndexSearcher.searchAfter(FieldDoc, Query, int, Sort)
    (PagingFieldCollector in TopFieldCollector.java): only rows
    STRICTLY after the mark in the (sort_cols, doc_id) total order are
    returned. The mark compiles to one lexicographic predicate pushed
    into the scan — deep pagination never re-reads earlier pages."""
    ids = hits_frame(searcher, query, mode).select("doc_id")
    out = _join_hits(docs_df, ids, mode)
    if after is not None:
        if len(after) != len(sort_cols) + 1:
            raise ValueError(
                f"after must carry one value per sort col plus doc_id "
                f"({len(sort_cols) + 1}), got {len(after)}"
            )
        keys = list(sort_cols) + [("doc_id", True)]
        strict = None  # OR of "equal on prefix, strictly after on col i"
        prefix_eq = None
        for (c, asc), v in zip(keys, after):
            col = F.col(c)
            # NULL-aware strict ordering matching orderBy's placement
            # (Spark default: asc = NULLS FIRST, desc = NULLS LAST) —
            # a plain col<v would silently drop NULL-valued matches
            if asc:
                this = col.isNotNull() if v is None else col > F.lit(v)
            else:
                this = F.lit(False) if v is None else (col < F.lit(v)) | col.isNull()
            branch = this if prefix_eq is None else prefix_eq & this
            strict = branch if strict is None else strict | branch
            eq = col.isNull() if v is None else col.eqNullSafe(F.lit(v))
            prefix_eq = eq if prefix_eq is None else prefix_eq & eq
        out = out.filter(strict)
    exprs = [F.asc(c) if asc else F.desc(c) for c, asc in sort_cols] + [F.asc("doc_id")]
    return out.orderBy(*exprs).limit(k)


def group_top_hits(
    searcher, query, docs_df: DataFrame, group_col: str, k_per_group: int = 2, mode: str = "driver"
) -> DataFrame:
    """Top-k hits per group value (lucene/grouping
    TopGroups/FirstPassGroupingCollector role, block-join-free variant:
    group key is a doc column). Scores every match, joins the group
    column, ranks within group by (score desc, doc_id asc) — the same
    tie-break as TopScoreDocCollector (HitQueue.java:78-84). Returns
    (group_col, grank, doc_id, score). At scale the hit set stays a
    DataFrame and the window is a shuffle on the group key; the
    broadcast here is of the scored hit ids only."""
    hits = hits_frame(searcher, query, mode).withColumn("score", F.col("score").cast("double"))
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        _join_hits(docs_df, hits, mode)
        .withColumn("grank", F.row_number().over(w))
        .filter(F.col("grank") <= k_per_group)
        .select(group_col, F.col("grank").cast("long"), "doc_id", "score")
    )


def rescore(searcher, first_pass, second_query, top_n: int = 10, weight: float = 1.0):
    """Two-pass ranking (CORE/search/QueryRescorer.java:36-104; the
    :141-164 static ``rescore(searcher, topDocs, query, weight, topN)``
    convenience is this signature): ``second_query`` is evaluated ONLY
    against the first-pass hits; a hit's combined score is the Java
    float expression first + weight * second where the second query
    matches it, the first-pass score alone where it doesn't
    (combine(first, secondMatches, second) with the default weighted
    sum). Hits re-sort by (score desc, doc_id asc) — QueryRescorer's
    comparator, :86-97 — and cut to ``top_n``. ``total_hits`` stays the
    FIRST pass's total: rescoring reorders, it never changes the match
    count.

    Scale shape: the second pass rides the distributed hit relation
    (match_frame — per-chunk kernels, nothing O(matches) on the
    driver) inner-joined to the broadcast ≤len(hits) first-pass id
    set, so only O(first-pass) rows reach the driver even when
    ``second_query`` matches half the corpus."""
    import numpy as np

    from lucene_spark.search.engine import TopDocs

    hits = list(first_pass.hits)
    if not hits:
        return TopDocs([], first_pass.total_hits, first_pass.relation, {"mode": "rescore"})
    spark = searcher.index.spark
    ids = spark.createDataFrame([(int(d),) for d, _ in hits], "doc_id bigint")
    second = searcher.match_frame(second_query).join(F.broadcast(ids), "doc_id")
    smap = {int(r["doc_id"]): np.float32(r["score"]) for r in second.collect()}
    w = np.float32(weight)
    combined = []
    for d, s in hits:
        c = np.float32(s)
        s2 = smap.get(int(d))
        if s2 is not None:
            c = np.float32(c + np.float32(w * s2))
        combined.append((int(d), float(c)))
    combined.sort(key=lambda t: (-t[1], t[0]))
    return TopDocs(
        combined[:top_n], first_pass.total_hits, first_pass.relation, {"mode": "rescore"}
    )


def facet_range_counts(
    searcher, query, docs_df: DataFrame, value_col: str, ranges, mode: str = "driver"
) -> DataFrame:
    """Numeric range facets (lucene/facet/src/java/org/apache/lucene/
    facet/range/LongRangeFacetCounts.java:30-90): counts of matching
    docs whose ``value_col`` falls in each labeled range. ``ranges`` is
    a list of (label, lo, hi, min_incl, max_incl) — or (label, lo, hi)
    meaning [lo, hi) like LongRange's minInclusive/maxExclusive
    default. Ranges MAY overlap; each is counted independently (the
    reference counts a doc once per containing range). Returns
    (label, cnt) in the given range order.

    Plan shape: one broadcast semi-join of the hit ids against the docs
    scan, then a single pass computing every range predicate as a
    conditional sum — no per-range scan, no shuffle beyond the final
    1-row-per-range aggregate."""
    ids = hits_frame(searcher, query, mode).select("doc_id")
    v = F.col(value_col)
    aggs = []
    for r in ranges:
        label, lo, hi = r[0], r[1], r[2]
        min_incl = r[3] if len(r) > 3 else True
        max_incl = r[4] if len(r) > 4 else False
        cond = (v >= lo if min_incl else v > lo) & (v <= hi if max_incl else v < hi)
        aggs.append(F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(label))
    wide = _join_hits(docs_df, ids, mode).agg(*aggs)
    # unpivot to (label, cnt) preserving the caller's range order
    labels = [r[0] for r in ranges]
    stack = ", ".join(f"'{label}', `{label}`" for label in labels)
    return wide.selectExpr(f"stack({len(labels)}, {stack}) AS (label, cnt)")


def long_value_facet_counts(
    searcher, query, docs_df: DataFrame, value_expr, n: int | None = None, mode: str = "driver"
) -> DataFrame:
    """LongValueFacetCounts (lucene/facet/src/java/org/apache/lucene/
    facet/LongValueFacetCounts.java:47-90): counts of each distinct
    LONG value of a LongValuesSource across the match set.
    ``value_expr`` is a column name or any Catalyst Column (the
    LongValuesSource generality — e.g. ``F.col("n_chars") / 100``).
    ``n`` = getTopChildren(n) ordering (cnt desc, value asc, top n);
    ``n=None`` = getAllChildrenSortByValue (value asc, all).
    One semi-join + one aggregate keyed by the value — at scale the
    distinct-value cardinality bounds the shuffle, not the match set."""
    ids = hits_frame(searcher, query, mode).select("doc_id")
    v = (F.col(value_expr) if isinstance(value_expr, str) else value_expr).cast("long")
    counts = (
        _join_hits(docs_df, ids, mode)
        .groupBy(v.alias("value"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    if n is None:
        return counts.orderBy(F.asc("value"))
    return counts.orderBy(F.desc("cnt"), F.asc("value")).limit(n)


def facet_sum_associations(
    searcher, query, docs_df: DataFrame, cat_col: str, weight_expr, n: int | None = None,
    mode: str = "driver",
) -> DataFrame:
    """Association facets (lucene/facet/src/java/org/apache/lucene/
    facet/taxonomy/TaxonomyFacetIntAssociations.java /
    FloatAssociations — aggregate a per-doc association WEIGHT per
    category instead of counting): sum of ``weight_expr`` grouped by
    ``cat_col`` over the match set, ordered sum desc / category asc
    (getTopChildren), all categories when ``n`` is None."""
    ids = hits_frame(searcher, query, mode).select("doc_id")
    w = F.col(weight_expr) if isinstance(weight_expr, str) else weight_expr
    out = (
        _join_hits(docs_df, ids, mode)
        .groupBy(F.col(cat_col).alias("category"))
        .agg(F.sum(w).alias("weight"))
        .orderBy(F.desc("weight"), F.asc("category"))
    )
    return out if n is None else out.limit(n)


def taxonomy_counts(
    searcher, query, docs_df: DataFrame, components, path: tuple = (), mode: str = "driver"
) -> DataFrame:
    """Hierarchical (taxonomy) facet counts (lucene/facet taxonomy:
    FastTaxonomyFacetCounts.getTopChildren over a hierarchical dim,
    lucene/facet/src/java/org/apache/lucene/facet/taxonomy/
    TaxonomyFacets.java): the dimension's path components are doc
    columns in order (FacetsConfig.setHierarchical role). Given a
    ``path`` prefix of values for the first len(path) components,
    return (child, cnt) counts of the NEXT component among matching
    docs under that prefix, sorted by cnt desc then child asc —
    getTopChildren's ordering."""
    if len(path) >= len(components):
        raise ValueError("path must be a strict prefix of components")
    ids = hits_frame(searcher, query, mode).select("doc_id")
    out = _join_hits(docs_df, ids, mode)
    for col, val in zip(components, path):
        out = out.filter(F.col(col) == val)
    child = components[len(path)]
    return (
        out.groupBy(F.col(child).alias("child"))
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("child"))
    )


def drill_down(base_query, dims: dict) -> "object":
    """DrillDownQuery role (lucene/facet/src/java/org/apache/lucene/
    facet/DrillDownQuery.java:38-120): narrow ``base_query`` by facet
    selections — each dimension's values OR together, dimensions AND
    together, all as non-scoring FILTER clauses (the reference adds
    drill-down terms with Occur.FILTER). Returns the combined Query;
    run it through Searcher.search as usual. ``dims`` maps a keyword
    doc column to one value or a tuple of values."""
    from lucene_spark.search import ast as A

    clauses = [(A.Occur.MUST, base_query)] if base_query is not None else []
    if not clauses:
        clauses = [(A.Occur.MUST, A.MatchAllDocsQuery())]
    for col, vals in dims.items():
        vals = vals if isinstance(vals, (tuple, list)) else (vals,)
        alts = [A.FieldValueQuery(col, v) for v in vals]
        one = (
            alts[0]
            if len(alts) == 1
            else A.BooleanQuery(tuple((A.Occur.SHOULD, a) for a in alts))
        )
        clauses.append((A.Occur.FILTER, one))
    return A.BooleanQuery(tuple(clauses))


def drill_sideways(
    searcher, base_query, dims: dict, docs_df: DataFrame, mode: str = "driver"
) -> DataFrame:
    """DrillSideways role (lucene/facet/src/java/org/apache/lucene/
    facet/DrillSideways.java:63-90): for each drilled dimension, facet
    counts are computed over the base query narrowed by every OTHER
    dimension's filter — so the UI can show the counts a user would
    get by switching that dimension's selection — while hits use the
    full drill-down.  Returns one relation (dim, value, cnt) across
    all drilled dims, each dim's rows sorted by cnt desc, value asc.

    Spark disposition: one match relation per dimension (the
    reference's DrillSidewaysScorer likewise tracks one
    near-miss-scorer per dim); each is a hits_frame groupBy — in
    distributed mode nothing O(matches) lands on the driver."""
    from functools import reduce

    frames = []
    for d in dims:
        others = {c: v for c, v in dims.items() if c != d}
        q = drill_down(base_query, others)
        counts = facet_counts(searcher, q, docs_df, d, mode).select(
            F.lit(d).alias("dim"), F.col(d).cast("string").alias("value"), "cnt"
        )
        frames.append(counts)
    out = reduce(DataFrame.unionByName, frames)
    return out.orderBy(F.asc("dim"), F.desc("cnt"), F.asc("value"))


def term_occurrences(searcher, term: str) -> dict[int, tuple]:
    """doc_id → (starts, ends) char-offset arrays of ``term``'s
    occurrences, straight from the offsets index (no re-analysis —
    the IndexOptions..._AND_OFFSETS read path)."""
    pl = searcher.index.collect_postings([term], with_offsets=True).get(term)
    if pl is None:
        return {}
    return {int(d): pl.offsets[i] for i, d in enumerate(pl.docs)}


def term_occurrences_for_docs(searcher, terms, doc_ids) -> dict[str, dict[int, tuple]]:
    """term → doc_id → (starts, ends) restricted to ``doc_ids`` — ONE
    batched postings read for all terms, keeping only the hit docs'
    offset arrays driver-side (:func:`term_occurrences` materializes
    every matching doc's offsets, which is O(matches) on a common term
    — fine for the all-docs probe, wrong for top-k highlighting)."""
    import numpy as np

    pls = searcher.index.collect_postings(list(terms), with_offsets=True)
    ids = np.asarray(sorted({int(d) for d in doc_ids}), dtype=np.int64)
    out: dict[str, dict[int, tuple]] = {}
    for t, pl in pls.items():
        if not len(pl.docs):
            continue
        j = np.searchsorted(pl.docs, ids)
        jc = np.minimum(j, len(pl.docs) - 1)
        ok = (j < len(pl.docs)) & (pl.docs[jc] == ids)
        for d, i in zip(ids[ok], jc[ok]):
            out.setdefault(t, {})[int(d)] = pl.offsets[int(i)]
    return out


def term_occurrences_tv(searcher, terms, doc_ids) -> dict[str, dict[int, tuple]]:
    """term → doc_id → (starts, ends) from the TERM VECTORS table (the
    FastVectorHighlighter source, lucene/highlighter/.../vectorhighlight/
    FastVectorHighlighter.java: highlighting driven by per-document
    vectors with positions+offsets instead of the postings offsets
    index). One pushed-down scan over the doc-range-partitioned
    term_vectors table, pruned by doc_id AND term."""
    tv = searcher.index.term_vectors_df
    if "sts" not in tv.columns:
        raise ValueError(
            "term vectors lack offsets (build with IndexConfig.offsets=True "
            "and term_vectors=True for the FVH source)"
        )
    rows = (
        tv.filter(F.col("doc_id").isin([int(d) for d in doc_ids]))
        .filter(F.col("term").isin(list(terms)))
        .select("doc_id", "term", "sts", "ens")
        .collect()
    )
    out: dict[str, dict[int, tuple]] = {}
    for r in rows:
        out.setdefault(r["term"], {})[int(r["doc_id"])] = (r["sts"], r["ens"])
    return out


def term_occurrences_analysis(
    searcher, terms, doc_ids, texts: dict[int, str]
) -> dict[str, dict[int, tuple]]:
    """term → doc_id → (starts, ends) by RE-ANALYZING the stored text
    (the UnifiedHighlighter OffsetSource.ANALYSIS fallback,
    lucene/highlighter/.../uhighlight/FieldOffsetStrategy.java /
    UnifiedHighlighter.getOffsetSource: when the index was built with
    neither offsets nor term vectors, highlighting re-runs the
    analyzer over the stored field text). Runs the index's RECORDED
    analyzer + char-filter chain (manifest contract — same chain as
    indexing) over only the k hit texts, so cost is O(k) driver work,
    never a scan."""
    from lucene_spark.analysis.tokenizer import tokenize_pos_off_series

    cf = tuple(searcher.index.manifest.get("char_filters") or ())
    ids = [int(d) for d in doc_ids]
    ser = pd.Series([texts.get(i, "") or "" for i in ids])
    toks_s, _poss, st_s, en_s = tokenize_pos_off_series(
        ser, stem=searcher.index.analyzer, char_filters=cf
    )
    tset = set(terms)
    out: dict[str, dict[int, tuple]] = {}
    for i, did in enumerate(ids):
        acc: dict[str, tuple[list, list]] = {}
        for t, s, e in zip(toks_s.iloc[i], st_s.iloc[i], en_s.iloc[i]):
            if t in tset:
                sts, ens = acc.setdefault(t, ([], []))
                sts.append(int(s))
                ens.append(int(e))
        for t, (sts, ens) in acc.items():
            out.setdefault(t, {})[did] = (sts, ens)
    return out


def first_match_window(
    searcher,
    term: str,
    docs_df: DataFrame,
    text_col: str = "text",
    pre: int = 20,
    post: int = 40,
    source: str = "offsets",
) -> DataFrame:
    """Deterministic highlight probe: for every doc matching ``term``,
    (doc_id, n_occ, first_start, last_end, snippet) where snippet =
    pre-context + <b>match</b> + post-context sliced from the stored
    text at the match offsets. The simple fixed window makes the
    output SQL-re-derivable (the gate oracle); :func:`highlight_indexed`
    is the passage-scored production API.

    ``source``: "offsets" reads the INDEXED offsets
    (OffsetSource.POSTINGS); "analysis" re-analyzes the stored text
    with the index's recorded analyzer (OffsetSource.ANALYSIS — works
    on an index built without offsets). Both produce identical rows
    (the same DuckDB oracle checks each)."""
    if source == "analysis":
        pl = searcher.index.collect_postings([term]).get(term)
        ids = [] if pl is None else [int(d) for d in pl.docs]
        texts = {
            r["doc_id"]: r[text_col]
            for r in docs_df.filter(F.col("doc_id").isin(ids))
            .select("doc_id", text_col)
            .collect()
        }
        occ = term_occurrences_analysis(searcher, [term], ids, texts).get(term, {})
    elif source == "offsets":
        occ = term_occurrences(searcher, term)
    else:
        raise ValueError(f"unknown offset source {source!r}")
    spark = docs_df.sparkSession
    rows = [
        (int(d), int(len(st)), int(st[0]), int(en[0]), int(en[-1]))
        for d, (st, en) in occ.items()
        if len(st)
    ]
    hits = spark.createDataFrame(
        rows,
        "doc_id bigint, n_occ bigint, first_start bigint, first_end bigint, last_end bigint",
    )
    t = F.col(text_col)
    s = F.col("first_start")
    # bold exactly the INDEXED span (on a stemmed/split-token index the
    # surface token is longer than the query term — the end offset is
    # authoritative, not len(term))
    end1 = F.col("first_end")
    snippet = F.concat(
        F.substring(t, F.greatest(F.lit(1), s + 1 - pre).cast("int"), F.least(s, F.lit(pre)).cast("int")),
        F.lit("<b>"),
        F.substring(t, (s + 1).cast("int"), (end1 - s).cast("int")),
        F.lit("</b>"),
        F.substring(t, (end1 + 1).cast("int"), F.lit(post)),
    )
    return (
        docs_df.join(F.broadcast(hits), "doc_id")
        .select("doc_id", "n_occ", "first_start", "last_end", snippet.alias("snippet"))
        .orderBy("doc_id")
    )


def highlight_indexed(
    searcher,
    query,
    docs_df: DataFrame,
    text_col: str = "text",
    k: int = 10,
    max_passages: int = 2,
    max_passage_chars: int = 120,
    source: str = "offsets",
) -> list[dict]:
    """UnifiedHighlighter-style highlighting from INDEXED offsets
    (lucene/highlighter/.../uhighlight/UnifiedHighlighter.java role):
    search top-k, gather every query-term occurrence's (start, end)
    from the offsets index (no re-analysis), group matches into
    passages of <= max_passage_chars, score each passage à la
    PassageScorer (Σ idf(term) per occurrence + distinct-term bonus),
    return the best passages per hit with <b></b> marks placed at the
    indexed offsets.

    ``source`` picks the offsets provider — "offsets" (the postings
    offsets index, UnifiedHighlighter.OffsetSource.POSTINGS) or
    "term_vectors" (per-doc vectors with offsets, the
    FastVectorHighlighter source / OffsetSource.TERM_VECTORS), or
    "analysis" (re-analyze the stored text with the index's recorded
    analyzer, OffsetSource.ANALYSIS — the fallback that works on an
    index built with NEITHER offsets nor term vectors); all three
    produce byte-identical passages (tests/test_termvectors.py
    parity)."""
    import numpy as np

    from lucene_spark.search import ast as A

    td = searcher.search(query, k=k)
    if not td.hits:
        return []
    q = searcher.prepare(query, collect_rows=True)[0]
    terms = sorted(A.extract_terms(q))
    stats = searcher.index.stats
    tstats = searcher.index.term_stats(terms)
    weights = {
        t: float(np.log(1 + (stats.doc_count - df + 0.5) / (df + 0.5)))
        for t, (df, _) in tstats.items()
    }
    hit_ids = [int(d) for d, _ in td.hits]
    texts = {
        r["doc_id"]: r[text_col]
        for r in docs_df.filter(F.col("doc_id").isin(hit_ids)).select("doc_id", text_col).collect()
    }
    if source == "term_vectors":
        occ_by_term = term_occurrences_tv(searcher, terms, hit_ids)
    elif source == "offsets":
        occ_by_term = term_occurrences_for_docs(searcher, terms, hit_ids)
    elif source == "analysis":
        occ_by_term = term_occurrences_analysis(searcher, terms, hit_ids, texts)
    else:
        raise ValueError(f"unknown offset source {source!r}")
    out = []
    for doc_id, score in td.hits:
        matches = []  # (start, end, term)
        for t in terms:
            se = occ_by_term.get(t, {}).get(int(doc_id))
            if se is not None:
                matches.extend((int(s), int(e), t) for s, e in zip(*se))
        matches.sort()
        text = texts.get(int(doc_id), "")
        # greedy passage grouping: a passage absorbs every match that
        # fits within max_passage_chars of its first match
        passages = []
        i = 0
        while i < len(matches):
            j = i
            while j + 1 < len(matches) and matches[j + 1][1] - matches[i][0] <= max_passage_chars:
                j += 1
            group = matches[i : j + 1]
            span = group[-1][1] - group[0][0]
            lead = max(0, (max_passage_chars - span) // 2)
            ps = max(0, group[0][0] - lead)
            pe = min(len(text), group[-1][1] + max(0, max_passage_chars - span - lead))
            pscore = sum(weights.get(t, 0.0) for _, _, t in group) + len({t for _, _, t in group})
            passages.append((pscore, ps, pe, group))
            i = j + 1
        passages.sort(key=lambda p: (-p[0], p[1]))
        rendered = []
        for _, ps, pe, group in sorted(passages[:max_passages], key=lambda p: p[1]):
            frag, cur = [], ps
            for s, e, _ in group:
                frag.append(text[cur:s])
                frag.append("<b>" + text[s:e] + "</b>")
                cur = e
            frag.append(text[cur:pe])
            rendered.append(("..." if ps > 0 else "") + "".join(frag) + ("..." if pe < len(text) else ""))
        out.append({"doc_id": int(doc_id), "score": float(score), "passages": rendered})
    return out


def _make_snippet(text: str, terms: set[str], window: int = 6, max_passages: int = 2) -> str:
    toks = text.split()
    marks = [i for i, t in enumerate(toks) if tokenize(t) and tokenize(t)[0] in terms]
    if not marks:
        return ""
    passages, used_end = [], -1
    for m in marks:
        if m < used_end:  # hi is exclusive: a mark AT used_end was not rendered
            continue
        lo, hi = max(0, m - window), min(len(toks), m + window + 1)
        frag = " ".join(
            f"<b>{w}</b>" if (tokenize(w) and tokenize(w)[0] in terms) else w for w in toks[lo:hi]
        )
        passages.append(("... " if lo > 0 else "") + frag + (" ..." if hi < len(toks) else ""))
        used_end = hi
        if len(passages) >= max_passages:
            break
    return " ".join(passages)


def highlight(df: DataFrame, terms, text_col: str = "text", window: int = 6) -> DataFrame:
    """Add a ``snippet`` column with <b>-marked passages around query
    terms. Arrow-batched; no per-row Python in the Spark plan."""
    from pyspark.sql.functions import pandas_udf

    tset = set(terms)

    @pandas_udf(StringType())
    def _snip(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: _make_snippet(t or "", tset, window))

    return df.withColumn("snippet", _snip(F.col(text_col)))
