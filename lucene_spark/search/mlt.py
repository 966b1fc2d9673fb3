"""MoreLikeThis (the lucene/queries mlt module role).

The reference's ``MoreLikeThis.like(docNum)``
(lucene/queries/src/java/org/apache/lucene/queries/mlt/
MoreLikeThis.java:121-160 defaults, :570-640 term selection) extracts
the "interesting" terms of a source document — keep terms with
``tf >= minTermFreq`` (default 2) and ``df >= minDocFreq`` (default 5),
rank by ``tf * idf`` with the classic-similarity idf
``ln((numDocs+1)/(docFreq+1)) + 1`` (TFIDFSimilarity.idf), keep the top
``maxQueryTerms`` (default 25) — and ORs them into a BooleanQuery that
is then scored normally (BM25 here, as in the reference when BM25 is
the active Similarity).

Spark disposition: the source doc is one partition-pruned point read of
the docs table; term dfs are point lookups on the term-stats table
(IN-list pushed to the parquet scan); the resulting disjunction runs
through the normal WAND top-k path. Nothing here scales with corpus
size except the final query execution.
"""

from __future__ import annotations

import math

from lucene_spark.analysis.tokenizer import tokenize
from lucene_spark.search import ast as A

MIN_TERM_FREQ = 2  # MoreLikeThis.DEFAULT_MIN_TERM_FREQ
MIN_DOC_FREQ = 5  # MoreLikeThis.DEFAULT_MIN_DOC_FREQ
MAX_QUERY_TERMS = 25  # MoreLikeThis.DEFAULT_MAX_QUERY_TERMS


def interesting_terms_from_text(
    index,
    text: str,
    min_term_freq: int = MIN_TERM_FREQ,
    min_doc_freq: int = MIN_DOC_FREQ,
    max_query_terms: int = MAX_QUERY_TERMS,
) -> list[tuple[str, float]]:
    """(term, tf*idf) of the source text's selected terms, best first
    (MoreLikeThis.retrieveInterestingTerms(Reader) role,
    MoreLikeThis.java:659 — the index's docs table stores metadata +
    content sha only, so like-by-id goes through ``interesting_terms``
    with the source corpus relation). Ties break term-asc (the
    reference's PQ order on equal scores is insertion-dependent; we pin
    the deterministic choice)."""
    toks = tokenize(text or "")
    tf: dict[str, int] = {}
    for t in toks:
        tf[t] = tf.get(t, 0) + 1
    cands = sorted(t for t, n in tf.items() if n >= min_term_freq)
    if not cands:
        return []
    dfs = index.term_stats(cands)
    n_docs = index.stats.doc_count
    scored = []
    for t in cands:
        df = dfs.get(t, (0, 0))[0]
        if df < min_doc_freq:
            continue
        idf = math.log((n_docs + 1) / (df + 1)) + 1.0
        scored.append((t, tf[t] * idf))
    scored.sort(key=lambda p: (-p[1], p[0]))
    return scored[:max_query_terms]


def interesting_terms(index, doc_id: int, docs_df, text_col: str = "content", **params):
    """like(docNum) variant: fetch the source doc's text with a
    partition-pruned point read of ``docs_df`` (the source corpus
    relation — doc_id + text column), then select terms."""
    import pyspark.sql.functions as F

    rows = docs_df.filter(F.col("doc_id") == int(doc_id)).limit(1).collect()
    if not rows:
        return []
    return interesting_terms_from_text(index, rows[0][text_col], **params)


def more_like_this_query(index, doc_id: int, docs_df, text_col: str = "content", **params) -> A.Query:
    """BooleanQuery OR of the interesting terms (MoreLikeThis.like)."""
    terms = interesting_terms(index, doc_id, docs_df, text_col, **params)
    if not terms:
        return A.MatchNoDocsQuery()
    return A.BooleanQuery(tuple((A.Occur.SHOULD, A.TermQuery(t)) for t, _ in terms))


def more_like_this(searcher, doc_id: int, docs_df, text_col: str = "content", k: int = 10, **params):
    """Top-k docs similar to ``doc_id`` (source doc included if it
    matches, as in the reference — callers filter it if unwanted)."""
    q = more_like_this_query(searcher.index, doc_id, docs_df, text_col, **params)
    return searcher.search(q, k=k)
