"""Pluggable Similarity models vs from-definition brute force.

References:
- ClassicSimilarity.java:38-64 (tf = sqrt(freq), idf = ln((N+1)/(df+1))+1,
  lengthNorm = 1/sqrt(len)); TFIDFSimilarity.java:475-510 (normTable,
  queryWeight = boost*idf, score = tf*queryWeight*normTable[norm], f32)
- BooleanSimilarity.java:58-60 (score == boost)
- LMDirichletSimilarity.java:70-75 + LMSimilarity.java:145-147
  (score = boost*(ln(1+freq/(mu*p)) + ln(mu/(len+mu))) clamped at 0;
  p = (ttf+1)/(numFieldTokens+1)); SimilarityBase.java:76-96 multi-term
  composition = MultiSimScorer f32 sum of per-term clamped scores.
- DFRSimilarity.java:30-35 I(n)L2 (BasicModelIn.java:34-45 +
  AfterEffectL.java:33 + NormalizationH2.java:57-58): score =
  boost * log2((N+1)/(df+0.5)) * (1 - 1/(1 + tf*log2(1 + c*avgdl/len))).

Every model must agree with the brute scorer on score VALUES and on
rank order, in driver mode (WAND + conjunction + exhaustive kernels)
and distributed mode, and block-max pruning must stay exact.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest

from lucene_spark.analysis.tokenizer import tokenize
from lucene_spark.codec.smallfloat import NORM_LENGTH_TABLE, int_to_byte4
from lucene_spark.search.engine import Searcher
from lucene_spark.search.similarity import get_similarity

MU = 2000.0


class BruteSim:
    """From-definitions exhaustive scorer for all 4 models."""

    def __init__(self, corpus_pdf):
        ordered = corpus_pdf.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
        self.toks = {i: tokenize(ordered.loc[i, "content"]) for i in range(len(ordered))}
        self.tfs = {i: Counter(t) for i, t in self.toks.items()}
        self.N = len(self.toks)
        self.sum_ttf = sum(len(t) for t in self.toks.values())
        # engine stores the SmallFloat-encoded length; decode like kernels do
        self.enc_len = {
            i: int(NORM_LENGTH_TABLE[int_to_byte4(len(t))]) for i, t in self.toks.items()
        }

    def df(self, term):
        return sum(1 for c in self.tfs.values() if term in c)

    def ttf(self, term):
        return sum(c[term] for c in self.tfs.values())

    def term_scores(self, term, model, boost=1.0):
        df, ttf = self.df(term), self.ttf(term)
        out = {}
        for i, c in self.tfs.items():
            f = c.get(term, 0)
            if not f:
                continue
            out[i] = self._score(model, f, self.enc_len[i], df, ttf, boost)
        return out

    def _score(self, model, f, L, df, ttf, boost=1.0):
        b = np.float32(boost)
        if model == "bm25":
            idf = np.float32(np.log(1.0 + (self.N - df + 0.5) / (df + 0.5)))
            w = np.float32(b * idf)
            avgdl = np.float32(self.sum_ttf / float(self.N))
            inv = np.float32(1.0) / (
                np.float32(1.2) * ((np.float32(0.25)) + np.float32(0.75) * np.float32(L) / avgdl)
            )
            return float(w - w / (np.float32(1.0) + np.float32(f) * inv))
        if model == "classic":
            idf = np.float32(np.log((self.N + 1) / float(df + 1)) + 1.0)
            w = np.float32(b * idf)
            tf = np.float32(np.sqrt(float(f)))
            return float(np.float32(np.float32(tf * w) * np.float32(1.0 / np.sqrt(L))))
        if model == "boolean":
            return float(b)
        if model == "lmdirichlet":
            p = (ttf + 1.0) / (self.sum_ttf + 1.0)
            s = float(boost) * (np.log1p(f / (MU * p)) + np.log(MU / (L + MU)))
            return float(np.float32(max(s, 0.0)))
        if model == "dfr":
            # DFR I(n)L2: tfn = f*log2(1 + avgdl/L); A = log2((N+1)/(df+.5))
            avgdl = np.float32(self.sum_ttf / float(self.N))
            tfn = f * np.log2(1.0 + float(avgdl) / max(L, 1))
            a = float(np.log2((self.N + 1) / (df + 0.5)))
            return float(np.float32(float(boost) * a * (1.0 - 1.0 / (1.0 + tfn))))
        if model == "lmjelinekmercer":
            # LMJelinekMercerSimilarity.java:63-69, lambda = 0.1
            lam = 0.1
            p = (ttf + 1.0) / (self.sum_ttf + 1.0)
            s = float(boost) * np.log1p(((1.0 - lam) * f / max(L, 1)) / (lam * p))
            return float(np.float32(s))
        if model == "dfi":
            # DFISimilarity.java:57-70 + IndependenceStandardized.java:32-34
            e = (ttf + 1.0) * max(L, 1) / (self.sum_ttf + 1.0)
            if f <= e:
                return 0.0
            m = (f - e) / np.sqrt(e)
            return float(np.float32(float(boost) * np.log2(m + 1.0)))
        if model in ("ib", "ib_ll", "ib_ttf"):
            # IBSimilarity.java:93-96; NormalizationH2 tfn; LambdaDF/TTF
            # (f32); DistributionSPL/LL
            avg = self.sum_ttf / float(self.N)
            tfn = f * np.log2(1.0 + avg / max(L, 1))
            if model == "ib_ttf":
                lam = float(np.float32((ttf + 1.0) / (self.N + 1.0)))
            else:
                lam = float(np.float32((df + 1.0) / (self.N + 1.0)))
            if model == "ib_ll":
                s = -np.log(lam / (tfn + lam))
            else:
                q = 1.0 - 1.0 / (tfn + 1.0)
                if q >= 1.0:
                    q = np.nextafter(1.0, 0.0)
                pw = lam**q
                if pw == lam:
                    pw = np.nextafter(lam, np.inf) if lam < 1 else np.nextafter(lam, -np.inf)
                s = -np.log((pw - lam) / (1.0 - lam))
            return float(np.float32(float(boost) * s))
        if model == "indri":
            # IndriDirichletSimilarity.java:60-66 — NO boost multiply,
            # no clamp, p = ttf/sumTtf (IndriCollectionModel)
            p = ttf / float(self.sum_ttf)
            return float(np.float32(np.log((f + MU * p) / (max(L, 1) + MU))))
        if model == "sweetspot":
            # default params degrade to classic: lengthNorm 1/sqrt(L),
            # tf sqrt(freq) (SweetSpotSimilarity.java:106-142)
            idf = np.float32(np.log((self.N + 1) / float(df + 1)) + 1.0)
            w = np.float32(b * idf)
            tf = np.float32(np.sqrt(float(f)))
            ln = np.float32(1.0 / np.sqrt(0.5 * (abs(L - 1) + abs(L - 1)) + 1.0))
            return float(np.float32(np.float32(tf * w) * ln))
        if model == "sweetspot_plateau":
            # ln_min=4, ln_max=32, steep=0.5, tf_base=1.5, tf_min=2
            idf = np.float32(np.log((self.N + 1) / float(df + 1)) + 1.0)
            w = np.float32(b * idf)
            tf = np.float32(1.5 if f <= 2 else np.sqrt(f + 1.5 * 1.5 - 2.0))
            ln = np.float32(1.0 / np.sqrt(0.5 * (abs(L - 4) + abs(L - 32) - 28) + 1.0))
            return float(np.float32(np.float32(tf * w) * ln))
        if model == "sweetspot_hyper":
            # hyperbolic tf defaults: min 0, max 2, base 1.3, xoffset 10
            idf = np.float32(np.log((self.N + 1) / float(df + 1)) + 1.0)
            w = np.float32(b * idf)
            x = float(f) - 10.0
            p, q = 1.3**x, 1.3**-x
            tf = np.float32(0.0 + 2.0 / 2.0 * ((p - q) / (p + q) + 1.0))
            ln = np.float32(1.0 / np.sqrt(0.5 * (abs(L - 1) + abs(L - 1)) + 1.0))
            return float(np.float32(np.float32(tf * w) * ln))
        if model.startswith("axiomatic"):
            # Axiomatic.java:96-105; F{1,2,3}{EXP,LOG} components
            variant = model[len("axiomatic") :]
            avg = self.sum_ttf / float(self.N)
            s_p, ql, k_p = 0.25, 1, 0.35
            tf = 1.0 + np.log1p(np.log(f + 1.0)) if variant[:2] in ("f1", "f3") else 1.0
            ln_c = (avg + s_p) / (avg + L * s_p) if variant[:2] == "f1" else 1.0
            tfln = f / (f + s_p + s_p * L / avg) if variant[:2] == "f2" else 1.0
            ratio = (self.N + 1.0) / df
            idf = ratio**k_p if variant.endswith("exp") else np.log(ratio)
            gamma = (L - ql) * s_p * ql / avg if variant[:2] == "f3" else 0.0
            return float(np.float32(max(0.0, (tf * ln_c * tfln * idf - gamma) * float(boost))))
        raise ValueError(model)

    def top_k(self, scores: dict, k=10):
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [(d, round(s, 4)) for d, s in ranked]


@pytest.fixture(scope="module")
def brute(corpus_pdf):
    return BruteSim(corpus_pdf)


def _hits(td, k=10):
    return [(d, round(float(s), 4)) for d, s in td.hits[:k]]


MODELS = [
    "classic",
    "boolean",
    "lmdirichlet",
    "dfr",
    "lmjelinekmercer",
    "dfi",
    "ib",
    "indri",
    "axiomaticf2exp",
    "axiomaticf3log",
    "sweetspot",
]


@pytest.mark.parametrize("model", MODELS)
def test_term_query_matches_brute(search_index, brute, model):
    se = Searcher(search_index, similarity=model)
    for term in ["return", "import", "data"]:
        want = brute.top_k(brute.term_scores(term, model))
        assert _hits(se.search(term, k=10)) == want, (model, term)
        assert _hits(se.search(term, k=10, mode="distributed")) == want, (model, term)


@pytest.mark.parametrize("model", MODELS)
def test_bool_or_and_matches_brute(search_index, brute, model):
    se = Searcher(search_index, similarity=model)
    a = brute.term_scores("return", model)
    c = brute.term_scores("class", model)
    # OR: f32 sum via float64 accumulate then cast (DisjunctionSumScorer)
    union = {}
    for d in set(a) | set(c):
        union[d] = float(np.float32(np.float64(a.get(d, 0.0)) + np.float64(c.get(d, 0.0))))
    want_or = brute.top_k(union)
    got_or = _hits(se.search("return OR class", k=10))
    assert got_or == want_or, model
    # AND
    inter = {d: union[d] for d in set(a) & set(c)}
    want_and = brute.top_k(inter)
    assert _hits(se.search("return AND class", k=10)) == want_and, model
    assert _hits(se.search("return AND class", k=10, mode="distributed")) == want_and, model


@pytest.mark.parametrize("model", MODELS)
def test_wand_equals_exhaustive(search_index, brute, model):
    """Block-max pruning must stay exact for every model (upper bounds
    from impacts hold because all models are monotone in freq and
    anti-monotone in length)."""
    se = Searcher(search_index, similarity=model, total_hits_threshold=1)
    se_full = Searcher(search_index, similarity=model, total_hits_threshold=10**9)
    for q in ["return OR class OR data", "import OR the"]:
        assert _hits(se.search(q, k=5)) == _hits(se_full.search(q, k=5)), (model, q)


@pytest.mark.parametrize("model", MODELS)
def test_phrase_weight_composition(search_index, brute, model):
    """PhraseWeight = Similarity.scorer over the term-stats ARRAY:
    summed idf (TFIDF), boost (Boolean), MultiSimScorer sum (LMD)."""
    se = Searcher(search_index, similarity=model)
    got = se.search('"the data"', k=10)
    # recompute phrase freqs by brute positional scan
    freqs = {}
    for i, toks in brute.toks.items():
        f = sum(
            1
            for j in range(len(toks) - 1)
            if toks[j] == "the" and toks[j + 1] == "data"
        )
        if f:
            freqs[i] = f
    if model == "classic":
        idf = np.float32(
            np.float32(np.log((brute.N + 1) / float(brute.df("the") + 1)) + 1.0)
            + np.float32(np.log((brute.N + 1) / float(brute.df("data") + 1)) + 1.0)
        )
        w = np.float32(np.float32(1.0) * np.float32(float(idf)))
        want = {
            i: float(
                np.float32(
                    np.float32(np.float32(np.sqrt(float(f))) * w)
                    * np.float32(1.0 / np.sqrt(brute.enc_len[i]))
                )
            )
            for i, f in freqs.items()
        }
    elif model == "boolean":
        want = {i: 1.0 for i in freqs}
    else:  # SimilarityBase models: MultiSimScorer f32 sum of per-term scores
        want = {}
        for i, f in freqs.items():
            tot = np.float32(0.0)
            for t in ("the", "data"):
                tot = tot + np.float32(
                    brute._score(model, f, brute.enc_len[i], brute.df(t), brute.ttf(t))
                )
            want[i] = float(tot)
    assert _hits(got) == brute.top_k(want), model


def test_bm25_is_default_and_unchanged(search_index):
    assert Searcher(search_index).sim.name == "bm25"
    a = Searcher(search_index).search("return OR class", k=10)
    b = Searcher(search_index, similarity="bm25").search("return OR class", k=10)
    assert a.hits == b.hits


def test_get_similarity_errors():
    with pytest.raises(ValueError):
        get_similarity("nope")


def test_multisimilarity_combsum(search_index, brute):
    """MultiSimilarity = float32 sum of the sub-similarity scores over
    the same stats (MultiSimilarity.java:31-70 CombSUM); exact through
    term/OR kernels and block-max pruning."""
    from lucene_spark.search.similarity import MultiSim

    se = Searcher(search_index, similarity=MultiSim(["bm25", "classic"]))
    for term in ["return", "data"]:
        a = brute.term_scores(term, "bm25")
        b = brute.term_scores(term, "classic")
        want = {
            d: float(np.float32(np.float32(a[d]) + np.float32(b[d]))) for d in a
        }
        assert _hits(se.search(term, k=10)) == brute.top_k(want), term
    # pruned == exhaustive
    se1 = Searcher(search_index, similarity=MultiSim(["bm25", "classic"]), total_hits_threshold=1)
    sef = Searcher(search_index, similarity=MultiSim(["bm25", "classic"]), total_hits_threshold=10**9)
    q = "return OR class OR data"
    assert _hits(se1.search(q, k=5)) == _hits(sef.search(q, k=5))
    with pytest.raises(ValueError):
        MultiSim([])


def test_perfield_similarity(spark, multifield_sim_index, brute):
    """PerFieldSimilarityWrapper: the title field scores with its own
    model while the primary keeps the default; each field matches the
    single-model searcher on that field exactly."""
    from lucene_spark.search import ast as A
    from lucene_spark.search.similarity import PerFieldSim

    pf = PerFieldSim(default="bm25", per_field={"title": "classic"})
    se = Searcher(multifield_sim_index, similarity=pf)
    se_bm25 = Searcher(multifield_sim_index, similarity="bm25")
    se_classic = Searcher(multifield_sim_index, similarity="classic")
    # primary-field query: identical to plain bm25
    assert se.search("return", k=10).hits == se_bm25.search("return", k=10).hits
    # title-field query: identical to plain classic on the same field
    tq = A.TermQuery("vector", field="title")
    assert se.search(tq, k=10).hits == se_classic.search(tq, k=10).hits
    # mixed boolean: per-clause scores from each field's own model
    bq = A.BooleanQuery(
        ((A.Occur.SHOULD, A.TermQuery("vector")), (A.Occur.SHOULD, tq))
    )
    got = dict(se.search(bq, k=10**6).hits)
    a = dict(se_bm25.search(A.TermQuery("vector"), k=10**6).hits)
    b = dict(se_classic.search(tq, k=10**6).hits)
    for d, s in got.items():
        want = np.float32(np.float64(a.get(d, 0.0)) + np.float64(b.get(d, 0.0)))
        assert s == pytest.approx(float(want), abs=1e-6), d
    # distributed mode resolves per-field models on executors too
    assert se.search(bq, k=10, mode="distributed").hits == se.search(bq, k=10).hits


@pytest.fixture(scope="module")
def multifield_sim_index(spark, corpus_pdf, tmp_path_factory):
    import shutil

    from lucene_spark.index.builder import IndexBuilder, IndexConfig
    from lucene_spark.index.reader import SearchIndex

    pdf = corpus_pdf.copy().reset_index(drop=True)
    pdf["doc_id"] = range(len(pdf))
    pdf["title"] = pdf["content"].str.split().str[:6].str.join(" ")
    d = str(tmp_path_factory.mktemp("pfsim"))
    IndexBuilder(
        spark,
        IndexConfig(docs_per_chunk=128, term_buckets=4, positions=True, extra_fields=("title",)),
    ).build(spark.createDataFrame(pdf).drop("content_sha256"), d, assign_ids=False)
    yield SearchIndex(spark, d)
    shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("model", ["ib_ll", "ib_ttf"])
def test_ib_component_variants(search_index, brute, model):
    """DistributionLL and LambdaTTF component swaps vs brute
    (DistributionLL.java:33-35, LambdaTTF.java:31-39)."""
    from lucene_spark.search.similarity import IBSim

    sim = IBSim(distribution="ll" if model == "ib_ll" else "spl",
                lam="ttf" if model == "ib_ttf" else "df")
    se = Searcher(search_index, similarity=sim)
    for term in ["return", "data"]:
        want = brute.top_k(brute.term_scores(term, model))
        assert _hits(se.search(term, k=10)) == want, (model, term)


def test_indri_scores_are_negative_and_pruning_exact(search_index):
    """Indri log-probabilities are negative for every hit; WAND and the
    conjunction kernel must still prune exactly (minCompetitive starts
    at -inf)."""
    se = Searcher(search_index, similarity="indri", total_hits_threshold=1)
    td = se.search("return OR class OR data", k=5)
    assert td.hits and all(s < 0 for _, s in td.hits)
    td_and = se.search("return AND class", k=5)
    assert td_and.hits and all(s < 0 for _, s in td_and.hits)


def test_sweetspot_plateau_and_hyperbolic(search_index, brute):
    """Non-default SweetSpot configs vs brute; the plateau config makes
    lengthNorm NON-monotone in length, so block-max pruning must fall
    back to the conservative best-norm bound and stay exact."""
    from lucene_spark.search.similarity import SweetSpotSim

    plateau = SweetSpotSim(ln_min=4, ln_max=32, ln_steep=0.5, tf_base=1.5, tf_min=2.0)
    assert not plateau.length_monotone
    se = Searcher(search_index, similarity=plateau)
    for term in ["return", "data"]:
        want = brute.top_k(brute.term_scores(term, "sweetspot_plateau"))
        assert _hits(se.search(term, k=10)) == want, term
    # pruning exact despite the plateau (conservative bound)
    se1 = Searcher(search_index, similarity=plateau, total_hits_threshold=1)
    sef = Searcher(search_index, similarity=plateau, total_hits_threshold=10**9)
    for q in ["return OR class OR data", "return AND class"]:
        assert _hits(se1.search(q, k=5)) == _hits(sef.search(q, k=5)), q

    hyper = SweetSpotSim(tf_mode="hyperbolic")
    assert hyper.length_monotone
    se_h = Searcher(search_index, similarity=hyper)
    want = brute.top_k(brute.term_scores("return", "sweetspot_hyper"))
    assert _hits(se_h.search("return", k=10)) == want
    with pytest.raises(ValueError):
        SweetSpotSim(tf_mode="nope")


def test_axiomatic_validation():
    from lucene_spark.search.similarity import AxiomaticSim

    with pytest.raises(ValueError):
        AxiomaticSim("f9exp")
    with pytest.raises(ValueError):
        AxiomaticSim("f2exp", s=1.5)
    with pytest.raises(ValueError):
        AxiomaticSim("f2exp", k=-0.1)
    with pytest.raises(ValueError):
        AxiomaticSim("f2exp", query_len=-1)


@pytest.mark.parametrize("model", MODELS)
def test_synonym_merged_stats(search_index, brute, model):
    """SynonymQuery merges term stats (df = max, ttf = sum,
    SynonymQuery.java:156-170) and scores the SUMMED tf once."""
    from lucene_spark.search import ast as A

    se = Searcher(search_index, similarity=model)
    terms = ("return", "class")
    got = se.search(A.SynonymQuery(terms), k=10)
    tf_union = {}
    for i, c in brute.tfs.items():
        f = c.get("return", 0) + c.get("class", 0)
        if f:
            tf_union[i] = f
    df = max(brute.df(t) for t in terms)
    ttf = sum(brute.ttf(t) for t in terms)
    want = {i: brute._score(model, f, brute.enc_len[i], df, ttf) for i, f in tf_union.items()}
    assert _hits(got) == brute.top_k(want), model
