"""Index-based text classification (the lucene/classification module).

The reference classifies ONE unseen text at a time by issuing counting
/ scoring queries against the index per (token, class) pair
(``SimpleNaiveBayesClassifier.java:209-277``). Re-expressed Spark-first
the same statistics become two small relations — a per-class prior
table and a (term, class) document-count table — trained in ONE
distributed pass over the labeled corpus (the same analyzer pipeline as
the index build), after which classification is a *batch* operator:
every unseen document in a DataFrame is classified in one broadcast
join + one aggregation, instead of |tokens| x |classes| point queries
per input. At 100 TB the train pass is a map + single shuffle (the
same cost class as index inversion) and the scoring pass shuffles only
the input tokens — the (term, class) table joins on its term key and
the tiny class table broadcasts.

Classes live in a doc-table column (StringField role — the reference
requires the class field be indexed-untokenized for the same reason,
``SimpleNaiveBayesClassifier.java:83-84``).

Implemented classifiers:

- :func:`naive_bayes_classify` — ``SimpleNaiveBayesClassifier.java:47-320``:
  log prior + add-1-smoothed per-token-occurrence likelihoods,
  softmax-normalized (``normClassificationResults`` :293-319).
- :func:`knn_classify` — ``KNearestNeighborClassifier.java:52-252``:
  MoreLikeThis top-k with per-term tf*idf boosts (``knnSearch`` sets
  ``mlt.setBoost(true)``, :158-166), class votes weighted by
  score/maxScore with the ``sumdoc < k`` correction (:193-234).

``BM25NBClassifier`` / ``KNearestFuzzyClassifier`` are score-variant
siblings of these two (same structure, different per-term statistic);
``BooleanPerceptronClassifier`` trains FST weights, a role the batch
NB trainer covers. Not replicated separately.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucene_spark.search import ast as A

__all__ = ["train_naive_bayes", "naive_bayes_classify", "knn_classify"]


def _tokens_udf(index):
    """array<string> tokens under the INDEX's analyzer chain (the
    reference tokenizes unseen text with the classifier's Analyzer,
    SimpleNaiveBayesClassifier.java:194-207)."""
    from pyspark.sql.functions import pandas_udf

    stem = index.analyzer
    char_filters = tuple(index.manifest.get("char_filters") or ())

    @pandas_udf("array<string>")
    def tok(texts):
        from lucene_spark.analysis.tokenizer import tokenize_series

        return tokenize_series(texts, stem=stem, char_filters=char_filters)

    return tok


def train_naive_bayes(
    index,
    docs_df: DataFrame,
    class_col: str,
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """One-pass training statistics over the labeled corpus.

    Returns ``(classes, word_class)``:

    - ``classes``: one row per class — ``n_c`` (docs with the class,
      the reference's ``docFreq(classTerm)``), ``prior`` (log prior,
      SimpleNaiveBayesClassifier.java:279-281) and ``den`` (the add-1
      smoothing denominator ``avgUniqueTerms * n_c + docsWithClass``,
      :209-252). Rows = |classes| — always broadcastable.
    - ``word_class``: (term, class) -> ``wf`` distinct-document counts
      (:263-277's counting query, batched). Rows <= |vocab| x |classes|.

    ``avgUniqueTerms`` = sumDocFreq/docCount of the primary text field
    (:241-252) comes from the index's term-stats table; the per-doc
    token sets come from re-analyzing ``docs_df`` with the index's own
    analyzer (the postings keep FOR-packed blobs, and the classifier
    needs doc-level distinct pairs — one map + one shuffle, the same
    shape as the build's inversion stage).
    """
    from lucene_spark.index.builder import FIELD_SEP

    spark = docs_df.sparkSession
    labeled = docs_df.filter(F.col(class_col).isNotNull())

    # docFreq(class term) per class + docsWithClass (:146, :167-185)
    counts = labeled.groupBy(class_col).agg(F.count("*").alias("n_c"))
    docs_with_class = counts.agg(F.sum("n_c")).collect()[0][0] or 0
    if docs_with_class == 0:
        raise ValueError(f"no documents carry a {class_col!r} value")

    # avg # of unique terms per doc for the text field (:241-252):
    # sumDocFreq = sum(df) over the primary field's term dictionary
    # (FIELD_SEP-prefixed terms belong to extra fields; a tiered index
    # keeps one row per (term, tier) and df sums across tiers).
    sum_df = (
        index.term_stats_df.filter(~F.col("term").contains(FIELD_SEP))
        .agg(F.sum("df"))
        .collect()[0][0]
    )
    avg_unique = float(sum_df) / float(index.stats.doc_count)

    classes = counts.select(
        F.col(class_col).alias("cls"),
        F.col("n_c").cast("long").alias("n_c"),
        (F.log(F.col("n_c").cast("double")) - math.log(docs_with_class)).alias("prior"),
        (F.col("n_c").cast("double") * avg_unique + float(docs_with_class)).alias("den"),
    )

    # (term, class) distinct-doc counts: the batched form of the
    # per-word MUST(class) counting query (:263-277)
    tok = _tokens_udf(index)
    word_class = (
        labeled.select(
            F.col(class_col).alias("cls"),
            F.explode(F.array_distinct(tok(F.col(text_col)))).alias("term"),
        )
        .groupBy("term", "cls")
        .agg(F.count("*").cast("long").alias("wf"))
    )
    return classes, word_class


def naive_bayes_classify(
    index,
    inputs_df: DataFrame,
    docs_df: DataFrame,
    class_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    model: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Classify every row of ``inputs_df`` (``id_col`` + ``text_col``)
    against the labeled corpus ``docs_df``.

    Returns one row per (input, class): ``id_col, cls, p, rank`` where
    ``p`` is the softmax-normalized posterior (:293-319) and rank 1 is
    the assigned class (``assignClass``, :102-114; ties break class-asc
    — the reference's sort is unstable on exact ties).

    Plan shape: input tokens (one Arrow-batched tokenize) x broadcast
    class table, left-joined to the (term, class) counts on the term
    key, one aggregation per (input, class), two windows for the
    softmax. No driver materialization of anything corpus-sized.
    """
    classes, word_class = model or train_naive_bayes(index, docs_df, class_col, text_col)

    tok = _tokens_udf(index)
    # token OCCURRENCES: calculateLogLikelihood (:209-231) adds
    # log P(w|c) once per occurrence, so keep multiplicity as tf
    tokens = (
        inputs_df.select(F.col(id_col), F.explode(tok(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    # every (input token, class) pair scores — absent (term, class)
    # postings still contribute log(1/den) (add-1 smoothing, :218)
    pair = (
        tokens.crossJoin(F.broadcast(classes))
        .join(word_class, ["term", "cls"], "left")
        .groupBy(id_col, "cls")
        .agg(
            (
                F.first("prior")
                + F.sum(
                    F.col("tf")
                    * F.log((F.coalesce(F.col("wf"), F.lit(0)) + F.lit(1.0)) / F.col("den"))
                )
            ).alias("ls")
        )
    )
    # inputs whose text analyzes to zero tokens score prior-only (the
    # reference's empty tokenizedText loop): left join from the full
    # input x class grid so they keep a distribution
    grid = inputs_df.select(id_col).crossJoin(F.broadcast(classes.select("cls", "prior")))
    scored = grid.join(pair, [id_col, "cls"], "left").select(
        id_col, "cls", F.coalesce("ls", "prior").alias("ls")
    )
    w = Window.partitionBy(id_col)
    e = scored.withColumn("el", F.exp(F.col("ls") - F.max("ls").over(w)))
    return (
        e.withColumn("p", F.col("el") / F.sum("el").over(w))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(
                    F.col("p").cast("float").desc(), F.col("cls")
                )
            ),
        )
        .select(id_col, "cls", "p", "rank")
    )


def knn_classify(
    searcher,
    text: str,
    docs_df: DataFrame,
    class_col: str,
    k: int = 10,
    filter_query: A.Query | None = None,
    **mlt_params,
) -> list[tuple[str, float]]:
    """K-nearest-neighbor classification of one unseen text
    (KNearestNeighborClassifier.java:119-234), best class first.

    The query is MoreLikeThis term selection with per-term boosts
    ``score/bestScore`` (``mlt.setBoost(true)`` in ``knnSearch``
    :158-166; MoreLikeThis.java createQuery boost path), a MUST
    constant-score class-field-exists clause (the reference's
    ``WildcardQuery(class:*)``, :172-175 — contributes 1.0 to every
    hit's score) and the optional MUST ``filter_query``. Votes
    (:193-234): per class among the top-k, ``count * (boost/count) / k``
    with ``boost = sum(score/maxScore)``, rescaled by ``k/sumdoc`` when
    fewer than k hits carry a class.

    Driver-mode convenience (one small top-k): batch classification at
    scale is :func:`naive_bayes_classify`'s join shape.
    """
    from lucene_spark.search.mlt import interesting_terms_from_text

    terms = interesting_terms_from_text(searcher.index, text, **mlt_params)
    if not terms:
        return []
    best = terms[0][1]
    clauses: list[tuple[A.Occur, A.Query]] = [
        (A.Occur.SHOULD, A.BoostQuery(A.TermQuery(t), s / best)) for t, s in terms
    ]
    clauses.append(
        (A.Occur.MUST, A.ConstantScoreQuery(A.FieldExistsQuery(class_col)))
    )
    if filter_query is not None:
        clauses.append((A.Occur.MUST, filter_query))
    td = searcher.search(A.BooleanQuery(tuple(clauses)), k=k)
    if not td.hits:
        return []
    ids = [int(d) for d, _ in td.hits]
    scores = {int(d): float(s) for d, s in td.hits}
    max_score = float(td.hits[0][1])
    cls_rows = (
        docs_df.filter(F.col("doc_id").isin(ids))
        .select("doc_id", class_col)
        .collect()
    )
    counts: dict[str, int] = {}
    boosts: dict[str, float] = {}
    for r in cls_rows:
        c = r[class_col]
        if c is None:
            continue
        counts[c] = counts.get(c, 0) + 1
        boosts[c] = boosts.get(c, 0.0) + scores[int(r["doc_id"])] / max_score
    sumdoc = sum(counts.values())
    if sumdoc == 0:
        return []
    out = []
    for c, cnt in counts.items():
        score = (cnt * (boosts[c] / cnt)) / float(k)
        if sumdoc < k:  # correction (:225-230)
            score = score * k / float(sumdoc)
        out.append((c, score))
    out.sort(key=lambda p: (-p[1], p[0]))
    return out
