"""lucene/classification parity: SimpleNaiveBayesClassifier and
KNearestNeighborClassifier vs from-definition brute force."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lucene_spark.analysis.tokenizer import tokenize
from lucene_spark.search import ast as A
from lucene_spark.search.classify import (
    knn_classify,
    naive_bayes_classify,
    train_naive_bayes,
)


def _brute_nb(corpus_pdf, text, text_col="content", class_col="lang"):
    """SimpleNaiveBayesClassifier.java:137-319 from definition."""
    docs = corpus_pdf[corpus_pdf[class_col].notna()]
    classes = sorted(docs[class_col].unique())
    n_c = {c: int((docs[class_col] == c).sum()) for c in classes}
    dwc = sum(n_c.values())
    # avgUniqueTerms = sumDocFreq / docCount over ALL docs' text field
    all_tok = [set(tokenize(t)) for t in corpus_pdf[text_col]]
    sum_df = sum(len(s) for s in all_tok)
    avg_unique = sum_df / len(corpus_pdf)
    # wf(w, c): docs with word AND class
    wf = {}
    for (cl, toks) in zip(corpus_pdf[class_col], all_tok):
        if cl is None or (isinstance(cl, float) and math.isnan(cl)):
            continue
        for w in toks:
            wf[(w, cl)] = wf.get((w, cl), 0) + 1
    scores = {}
    words = tokenize(text)
    for c in classes:
        den = avg_unique * n_c[c] + dwc
        ll = sum(math.log((wf.get((w, c), 0) + 1) / den) for w in words)
        scores[c] = math.log(n_c[c]) - math.log(dwc) + ll
    # softmax (normClassificationResults :293-319)
    m = max(scores.values())
    loga = m + math.log(sum(math.exp(v - m) for v in scores.values()))
    return {c: math.exp(v - loga) for c, v in scores.items()}


@pytest.fixture(scope="module")
def labeled_inputs(spark, corpus_pdf):
    """A handful of fixture docs re-presented as unseen inputs, plus an
    empty-text and an unseen-vocabulary input."""
    ordered = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    rows = [(int(i), ordered.loc[i, "content"]) for i in range(0, 40, 7)]
    rows.append((900, ""))  # zero tokens -> prior-only distribution
    rows.append((901, "zzzunseen xxqqword zzzunseen"))  # all-novel vocab
    return spark.createDataFrame(rows, "doc_id long, content string"), {
        i: t for i, t in rows
    }


class TestNaiveBayes:
    def test_matches_brute(self, spark, search_index, corpus_df, corpus_pdf, labeled_inputs):
        inputs_df, texts = labeled_inputs
        ordered = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
        docs = corpus_df.withColumn(
            "doc_id", F.row_number().over(Window.orderBy("repo", "path", "commit")) - 1
        )
        out = naive_bayes_classify(
            search_index, inputs_df, docs, class_col="lang", text_col="content"
        ).collect()
        got = {}
        for r in out:
            got.setdefault(r["doc_id"], {})[r["cls"]] = (r["p"], r["rank"])
        assert set(got) == set(texts)
        for i, text in texts.items():
            exp = _brute_nb(ordered, text)
            assert set(got[i]) == set(exp)
            for c, p in exp.items():
                assert got[i][c][0] == pytest.approx(p, rel=1e-9, abs=1e-12)
            # rank 1 = argmax (ties class-asc)
            best = min(exp, key=lambda c: (-np.float32(exp[c]), c))
            r1 = [c for c, (_, rk) in got[i].items() if rk == 1]
            assert r1 == [best]

    def test_prior_only_on_empty_text(self, search_index, corpus_pdf, labeled_inputs, spark):
        # empty text: p(c) = softmax(prior) = n_c / docsWithClass
        exp = _brute_nb(corpus_pdf, "")
        n = corpus_pdf["lang"].notna().sum()
        for c, p in exp.items():
            assert p == pytest.approx((corpus_pdf["lang"] == c).sum() / n, rel=1e-12)

    def test_train_reuse(self, spark, search_index, corpus_df, labeled_inputs):
        from pyspark.sql.window import Window

        inputs_df, _ = labeled_inputs
        docs = corpus_df.withColumn(
            "doc_id", F.row_number().over(Window.orderBy("repo", "path", "commit")) - 1
        )
        model = train_naive_bayes(search_index, docs, "lang", "content")
        a = naive_bayes_classify(
            search_index, inputs_df, docs, "lang", "content", model=model
        )
        b = naive_bayes_classify(search_index, inputs_df, docs, "lang", "content")
        ra = {(r["doc_id"], r["cls"]): r["rank"] for r in a.collect()}
        rb = {(r["doc_id"], r["cls"]): r["rank"] for r in b.collect()}
        assert ra == rb

    def test_rejects_unlabeled_corpus(self, spark, search_index, corpus_df):
        docs = corpus_df.withColumn("doc_id", F.lit(0)).withColumn(
            "nolabel", F.lit(None).cast("string")
        )
        with pytest.raises(ValueError, match="no documents carry"):
            train_naive_bayes(search_index, docs, "nolabel", "content")


def _brute_knn_votes(hits, id2cls, k):
    """KNearestNeighborClassifier.buildListFromTopDocs (:193-234)."""
    max_score = hits[0][1]
    counts, boosts = {}, {}
    for d, s in hits:
        c = id2cls.get(d)
        if c is None:
            continue
        counts[c] = counts.get(c, 0) + 1
        boosts[c] = boosts.get(c, 0.0) + s / max_score
    sumdoc = sum(counts.values())
    out = []
    for c, cnt in counts.items():
        sc = (cnt * (boosts[c] / cnt)) / k
        if sumdoc < k:
            sc = sc * k / sumdoc
        out.append((c, sc))
    out.sort(key=lambda p: (-p[1], p[0]))
    return out


class TestKnnClassifier:
    def _docs_with_ids(self, corpus_df):
        from pyspark.sql.window import Window

        return corpus_df.withColumn(
            "doc_id", F.row_number().over(Window.orderBy("repo", "path", "commit")) - 1
        )

    def test_matches_brute(self, spark, search_index, corpus_df, corpus_pdf, oracle):
        from lucene_spark.search.engine import Searcher
        from lucene_spark.search.mlt import interesting_terms_from_text

        ordered = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
        docs = self._docs_with_ids(corpus_df)
        searcher = Searcher(search_index)
        text = ordered.loc[0, "content"]
        k = 10
        got = knn_classify(searcher, text, docs, "lang", k=k)

        terms = interesting_terms_from_text(search_index, text)
        best = terms[0][1]
        q = A.BooleanQuery(
            tuple((A.Occur.SHOULD, A.BoostQuery(A.TermQuery(t), s / best)) for t, s in terms)
        )
        scores = oracle.score(q)
        # + 1.0: the MUST ConstantScore(class-field-exists) clause — all
        # fixture docs carry lang, so it matches everywhere
        hits = sorted(
            ((d, float(np.float32(s + np.float32(1.0)))) for d, s in scores.items()),
            key=lambda p: (-np.float32(p[1]), p[0]),
        )[:k]
        id2cls = {i: ordered.loc[i, "lang"] for i in range(len(ordered))}
        exp = _brute_knn_votes(hits, id2cls, k)
        assert [c for c, _ in got] == [c for c, _ in exp]
        for (gc, gs), (ec, es) in zip(got, exp):
            assert gs == pytest.approx(es, rel=1e-5)

    def test_sumdoc_correction(self, spark, search_index, corpus_df, corpus_pdf, oracle):
        """Null-class docs among the top-k trigger the k/sumdoc rescale."""
        from pyspark.sql.window import Window

        from lucene_spark.search.engine import Searcher
        from lucene_spark.search.mlt import interesting_terms_from_text

        ordered = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
        # strip the label from every even doc
        docs = corpus_df.withColumn(
            "doc_id", F.row_number().over(Window.orderBy("repo", "path", "commit")) - 1
        ).withColumn("lang", F.when(F.col("doc_id") % 2 == 1, F.col("lang")))
        searcher = Searcher(search_index)
        text = ordered.loc[3, "content"]
        k = 10
        got = knn_classify(searcher, text, docs, "lang", k=k)

        terms = interesting_terms_from_text(search_index, text)
        best = terms[0][1]
        q = A.BooleanQuery(
            tuple((A.Occur.SHOULD, A.BoostQuery(A.TermQuery(t), s / best)) for t, s in terms)
        )
        scores = oracle.score(q)
        hits = sorted(
            ((d, float(np.float32(s + np.float32(1.0)))) for d, s in scores.items()),
            key=lambda p: (-np.float32(p[1]), p[0]),
        )[:k]
        id2cls = {
            i: (ordered.loc[i, "lang"] if i % 2 == 1 else None) for i in range(len(ordered))
        }
        exp = _brute_knn_votes(hits, id2cls, k)
        assert sum(1 for d, _ in hits if id2cls.get(d) is None) > 0
        assert [c for c, _ in got] == [c for c, _ in exp]
        for (gc, gs), (ec, es) in zip(got, exp):
            assert gs == pytest.approx(es, rel=1e-5)

    def test_empty_text(self, spark, search_index, corpus_df):
        from lucene_spark.search.engine import Searcher

        docs = self._docs_with_ids(corpus_df)
        assert knn_classify(Searcher(search_index), "", docs, "lang") == []
