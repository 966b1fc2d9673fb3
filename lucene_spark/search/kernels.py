"""Vectorized scoring kernels (numpy) + query compilation.

The Scorer layer of the reference (Boolean2ScorerSupplier picking
ConjunctionScorer / DisjunctionSumScorer / ReqExclScorer / WANDScorer,
lucene/core/src/java/org/apache/lucene/search/Boolean2ScorerSupplier.java:141-247)
re-expressed block-at-a-time: doc-at-a-time iterators with galloping
``advance()`` become sorted-array set operations (np.intersect1d /
searchsorted membership), scores are float32 arrays, and boolean sums
accumulate in float64 before a final float32 cast — exactly the
double-accumulate-then-cast of DisjunctionSumScorer/ConjunctionScorer.

``compile_query`` captures global statistics into weights on the driver
(the Weight-creation step, TermQuery.java:56-100 / IndexSearcher.java:947)
producing a plain-dataclass spec tree that is cheap to ship into
executor-side kernels (distributed mode) or evaluate on the driver.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from lucene_spark.index.builder import FIELD_SEP
from lucene_spark.search import ast as A
from lucene_spark.search.similarity import BM25_SIM, BM25Stats


def field_of_key(key: str) -> str:
    """Field of a composite term key ("" = primary field)."""
    return key.split(FIELD_SEP, 1)[0] if FIELD_SEP in key else ""

EMPTY_I = np.empty(0, dtype=np.int64)
EMPTY_F = np.empty(0, dtype=np.float32)


# ---- compiled scorer specs (plain, picklable) -------------------------------


@dataclass(frozen=True)
class TermSpec:
    term: str  # composite key ("field\x1fterm") for non-primary fields
    weight: object  # similarity weight params (BM25: float32 boost * idf)
    field: str = ""  # "" = primary field (selects the norm-inverse cache)


@dataclass(frozen=True)
class SynonymSpec:
    terms: tuple[str, ...]
    weight: float
    field: str = ""


@dataclass(frozen=True)
class ConstSpec:
    """Constant-score doc-set (MultiTermQuery CONSTANT_SCORE rewrite)."""

    terms: tuple[str, ...]
    boost: float


@dataclass(frozen=True)
class AllSpec:
    boost: float


@dataclass(frozen=True)
class NoneSpec:
    pass


@dataclass(frozen=True)
class BoolSpec:
    musts: tuple = ()
    shoulds: tuple = ()
    filters: tuple = ()
    nots: tuple = ()
    msm: int = 0


@dataclass(frozen=True)
class DocSetSpec:
    """Constant-score membership in a resolved sorted doc-id set
    (keyword-field filters; see ast.FieldValueQuery)."""

    docs: tuple  # kept hashable; np view taken at evaluate time
    boost: float = 1.0


@dataclass(frozen=True)
class PredSpec:
    """Constant-score membership in a LAZY doc set (docs-table
    predicate). The ids never exist on the driver: the chunk context
    carries this chunk's slice under ``key`` (ctx.docsets), delivered
    by a pushed-down scan grouped by doc-range chunk."""

    key: tuple
    boost: float = 1.0


@dataclass(frozen=True)
class ValueSpec:
    """Per-doc scores derived from docs-table numeric column(s) — the
    FeatureQuery / DistanceFeatureQuery roles (FeatureField.java:221+,
    LongDistanceFeatureQuery.java:95-122). Driver mode resolves
    ``docs``/``vals`` up front; distributed mode sets ``key`` and each
    chunk context carries its own (docs, vals) slice (ctx.docvals).
    Both modes score through :func:`value_scores`, one float path."""

    kind: str  # feature_linear|feature_log|feature_saturation|feature_sigmoid|dist_long|dist_geo
    params: tuple
    boost: float = 1.0
    key: tuple | None = None  # distributed: ctx.docvals[key]
    docs: tuple = ()  # driver-resolved doc ids (sorted)
    vals: tuple = ()  # driver-resolved per-doc value tuples


@dataclass(frozen=True)
class DisMaxSpec:
    subs: tuple
    tie: float


@dataclass(frozen=True)
class PhraseSpec:
    terms: tuple[str, ...]
    weight: float
    slop: int = 0
    field: str = ""


@dataclass(frozen=True)
class SpanNearSpec:
    """Span/interval proximity (SpanNearQuery.java:42, Intervals.java):
    minimal intervals containing all terms (ordered or not) with
    gap count <= slop; freq = Σ 1/(1+gaps) per SpanScorer's sloppy
    accumulation."""

    terms: tuple[str, ...]
    weight: float
    slop: int = 0
    in_order: bool = True
    field: str = ""


@dataclass(frozen=True)
class IntervalSpec:
    """Interval algebra query (IntervalQuery.java role): ``source`` is
    a lucene_spark.search.intervals tree; terms = its literal terms
    (postings + positions fetched like phrase kernels); freq =
    Σ 1/(1 + max(0, gaps)) over the source's minimal intervals."""

    source: object
    terms: tuple[str, ...]
    weight: float
    field: str = ""
    # "saturation" (reference IntervalQuery: score = weight *
    # freq/(freq+pivot), weight = BOOST, no similarity/norms) or
    # "span" (SpanScorer convention: BM25 over the sloppy freq,
    # weight = the similarity multi-weight)
    score_mode: str = "span"
    pivot: float = 1.0


@dataclass(frozen=True)
class PayloadSpec:
    """PayloadScoreQuery / SpanPayloadCheckQuery kernel spec
    (lucene/queries/payloads; see ast.PayloadScoreQuery). ``kind``
    picks the wrapped-span shape: "term" (every occurrence), "or"
    (every occurrence of any member), "phrase" (exact ordered match of
    distinct terms; payloads of every slot per matching span).
    ``check`` (SpanPayloadCheckQuery) keeps only spans whose payload
    sequence equals it; None applies ``function`` as a score factor.
    Float32 summation runs per-term/per-slot then combines, so "sum"/
    "avg" may differ from the reference's position-interleaved
    accumulation order by f32 associativity (last-ulp; documented)."""

    terms: tuple[str, ...]
    kind: str  # term | or | phrase
    weight: object
    function: str = "avg"
    include_span_score: bool = True
    check: tuple | None = None
    field: str = ""


@dataclass(frozen=True)
class TermAutomatonSpec:
    """TermAutomatonQuery kernel spec (sandbox TermAutomatonScorer).
    ``terms``/``syms`` align: the automaton's real terms and their
    symbol ids; ``steps``/``accepts``/``any_sym`` are the finished DFA
    (automaton.TermDFA). Candidates = the UNION of the terms' postings
    (the scorer is a disjunction — TermAutomatonQuery.java:69-71);
    freq per doc = the countMatches state walk over the merged
    (position, symbol) stream; weight = similarity scorer over the
    stats of every term with df > 0 (TermAutomatonWeight:380-399)."""

    terms: tuple  # real terms present in the index (df > 0)
    syms: tuple  # symbol id per term, aligned with ``terms``
    steps: tuple
    accepts: tuple
    any_sym: "int | None"
    weight: object
    field: str = ""


@dataclass(frozen=True)
class MultiPhraseSpec:
    """Alternatives per slot (MultiPhraseQuery.java); weight = summed
    idf over ALL distinct terms, like PhraseWeight over the union."""

    slots: tuple[tuple[str, ...], ...]
    weight: float
    slop: int = 0
    field: str = ""


def compile_query(
    q: A.Query,
    stats: BM25Stats,
    term_df: dict[str, int],
    boost: float = 1.0,
    stats_by_field: dict[str, BM25Stats] | None = None,
    sim=None,
    term_ttf: dict[str, int] | None = None,
):
    """AST (+ global stats) → spec tree. ``term_df`` maps term → df;
    missing terms score nothing. Boost folds into weights as float32
    (BM25Scorer weight = boost * idf, BM25Similarity.java:236-238).
    ``stats_by_field`` supplies per-field CollectionStatistics for
    composite term keys (multi-field indexes); a key's field picks its
    own docCount for idf and its own norm-inverse cache at score time.
    ``sim`` picks the Similarity (default BM25; Similarity.scorer role);
    ``term_ttf`` supplies totalTermFreq for models that need it
    (sim.needs_ttf, e.g. LMDirichlet's collection probability)."""
    b32 = np.float32(boost)
    sim = sim if sim is not None else BM25_SIM
    ttf_of = (term_ttf or {}).get

    def _recur(sub, b):
        return compile_query(sub, stats, term_df, b, stats_by_field, sim, term_ttf)

    def _stats_of(key: str) -> tuple[str, BM25Stats]:
        f = field_of_key(key)
        if f and stats_by_field and f in stats_by_field:
            return f, stats_by_field[f]
        return f, stats
    if isinstance(q, A.MatchNoDocsQuery):
        return NoneSpec()
    if isinstance(q, A.MatchAllDocsQuery):
        return AllSpec(float(b32))
    if isinstance(q, A.BoostQuery):
        return _recur(q.query, float(np.float32(b32 * np.float32(q.boost))))
    if isinstance(q, A.ConstantScoreQuery):
        inner = q.query
        if isinstance(inner, A.TermInSetQuery):
            terms = tuple(t for t in inner.terms if term_df.get(t))
            return ConstSpec(terms, float(b32)) if terms else NoneSpec()
        if isinstance(inner, A.TermQuery):
            return ConstSpec((inner.term,), float(b32)) if term_df.get(inner.term) else NoneSpec()
        # generic: score inner, replace scores by boost
        sub = _recur(inner, 1.0)
        return ("const", sub, float(b32))
    if isinstance(q, A.TermQuery):
        df = term_df.get(q.term, 0)
        if df == 0:
            return NoneSpec()
        fld, st = _stats_of(q.term)
        return TermSpec(q.term, sim.for_field(fld).term_weight(st, df, ttf_of(q.term, 0), float(b32)), fld)
    if isinstance(q, A.BlendedTermQuery):
        # BlendedTermQuery.rewrite (BlendedTermQuery.java:270-300):
        # artificial df = max docFreq, ttf = sum totalTermFreq, each
        # term then scores as a plain TermQuery against its OWN field's
        # norms/avgdl but the blended frequencies
        present = [t for t in q.terms if term_df.get(t)]
        if not present:
            return NoneSpec()
        df_b = max(term_df[t] for t in present)
        ttf_b = sum(ttf_of(t, 0) for t in present)
        boosts = q.boosts if q.boosts is not None else (1.0,) * len(q.terms)
        subs = []
        for t, bo in zip(q.terms, boosts):
            if not term_df.get(t):
                continue
            fld, st = _stats_of(t)
            w = sim.for_field(fld).term_weight(st, df_b, ttf_b, float(np.float32(b32 * np.float32(bo))))
            subs.append(TermSpec(t, w, fld))
        if q.boolean_rewrite:
            return BoolSpec(shoulds=tuple(subs))
        return DisMaxSpec(tuple(subs), q.tie_breaker)
    if isinstance(q, A.SynonymQuery):
        present = [t for t in q.terms if term_df.get(t)]
        if not present:
            return NoneSpec()
        fld, st = _stats_of(q.terms[0])
        dfs = [term_df[t] for t in present]
        w = sim.for_field(fld).synonym_weight(st, dfs, [ttf_of(t, 0) for t in present], float(b32))
        return SynonymSpec(tuple(present), w, fld)
    if isinstance(q, A.TermInSetQuery):
        terms = tuple(t for t in q.terms if term_df.get(t))
        return ConstSpec(terms, float(b32)) if terms else NoneSpec()
    if isinstance(q, A.DocSetQuery):
        return DocSetSpec(q.doc_ids, float(b32)) if q.doc_ids else NoneSpec()
    if isinstance(q, A.PredDocSetQuery):
        return PredSpec(q.key, float(b32))
    if isinstance(q, A.DocValueScoreQuery):
        if not q.doc_ids:
            return NoneSpec()
        return ValueSpec(q.kind, q.params, float(b32), docs=q.doc_ids, vals=q.values)
    if isinstance(q, A.PredValueScoreQuery):
        return ValueSpec(q.kind, q.params, float(b32), key=q.key)
    if isinstance(q, A.PhraseQuery):
        if any(not term_df.get(t) for t in q.terms):
            return NoneSpec()
        fld, st = _stats_of(q.terms[0])
        w = sim.for_field(fld).multi_weight(st, [term_df[t] for t in q.terms], [ttf_of(t, 0) for t in q.terms], float(b32))
        return PhraseSpec(q.terms, w, q.slop, fld)
    if isinstance(q, A.SpanNearQuery):
        if any(not term_df.get(t) for t in q.terms):
            return NoneSpec()
        fld, st = _stats_of(q.terms[0])
        w = sim.for_field(fld).multi_weight(st, [term_df[t] for t in q.terms], [ttf_of(t, 0) for t in q.terms], float(b32))
        return SpanNearSpec(q.terms, w, q.slop, q.in_order, fld)
    if isinstance(q, A.IntervalQuery):
        from lucene_spark.search.intervals import terms_of

        terms = tuple(sorted(terms_of(q.source)))
        present = [t for t in terms if term_df.get(t)]
        if not present:
            return NoneSpec()
        fld, st = _stats_of(present[0])
        if getattr(q, "score_mode", "saturation") == "saturation":
            # reference IntervalQuery: weight IS the boost; no
            # similarity weight, no norms (IntervalQuery.java:41-58)
            return IntervalSpec(
                q.source, terms, float(b32), fld, score_mode="saturation", pivot=q.pivot
            )
        w = sim.for_field(fld).multi_weight(st, [term_df[t] for t in present], [ttf_of(t, 0) for t in present], float(b32))
        return IntervalSpec(q.source, terms, w, fld, score_mode="span")
    if isinstance(q, A.MultiPhraseQuery):
        slots = tuple(tuple(t for t in slot if term_df.get(t)) for slot in q.positions)
        if any(not s for s in slots):
            return NoneSpec()
        uniq = sorted({t for slot in slots for t in slot})
        fld, st = _stats_of(uniq[0])
        w = sim.for_field(fld).multi_weight(st, [term_df[t] for t in uniq], [ttf_of(t, 0) for t in uniq], float(b32))
        return MultiPhraseSpec(slots, w, q.slop, fld)
    if isinstance(q, (A.PayloadScoreQuery, A.SpanPayloadCheckQuery)):
        span = q.span
        while isinstance(span, A.BoostQuery):  # boost folds into the weight
            b32 = np.float32(b32 * np.float32(span.boost))
            span = span.query
        if isinstance(span, A.TermQuery):
            kind, pterms = "term", (span.term,)
        elif isinstance(span, A.SynonymQuery):
            kind, pterms = "or", tuple(span.terms)
        elif isinstance(span, A.PhraseQuery) and span.slop == 0:
            if len(set(span.terms)) != len(span.terms):
                raise ValueError("payload phrase spans require distinct terms (documented subset)")
            kind, pterms = "phrase", tuple(span.terms)
        else:
            raise ValueError(
                f"unsupported payload span shape {type(span).__name__} "
                "(subset: TermQuery / SynonymQuery-as-SpanOr / PhraseQuery slop=0)"
            )
        if kind == "or":
            pterms = tuple(t for t in pterms if term_df.get(t))
            if not pterms:
                return NoneSpec()
        elif any(not term_df.get(t) for t in pterms):
            return NoneSpec()
        uniq = sorted(set(pterms))
        fld, st = _stats_of(uniq[0])
        if kind == "term":
            w = sim.for_field(fld).term_weight(
                st, term_df[pterms[0]], ttf_of(pterms[0], 0), float(b32)
            )
        else:
            w = sim.for_field(fld).multi_weight(
                st, [term_df[t] for t in uniq], [ttf_of(t, 0) for t in uniq], float(b32)
            )
        if isinstance(q, A.SpanPayloadCheckQuery):
            check = tuple(float(np.float32(x)) for x in q.payloads)
            n_span = 1 if kind in ("term", "or") else len(pterms)
            if len(check) != n_span:
                # spans collecting a different payload count never match
                # (SpanPayloadCheckQuery PayloadChecker upto contract)
                return NoneSpec()
            return PayloadSpec(pterms, kind, w, check=check, field=fld)
        if q.function not in ("min", "max", "avg", "sum"):
            raise ValueError(f"unknown payload function {q.function!r}")
        return PayloadSpec(pterms, kind, w, q.function, q.include_span_score, None, fld)
    if isinstance(q, A.TermAutomatonQuery):
        dfa = q.dfa
        pairs = [
            (t, i)
            for i, t in enumerate(dfa.terms)
            if t is not None and term_df.get(t)
        ]
        if not pairs:
            return NoneSpec()  # no automaton term matches any doc
        uniq = sorted({t for t, _ in pairs})
        fld, st = _stats_of(uniq[0])
        # TermAutomatonWeight:380-399 — similarity scorer over the
        # stats of every term with df>0 (summed idfs for BM25)
        w = sim.for_field(fld).multi_weight(
            st, [term_df[t] for t in uniq], [ttf_of(t, 0) for t in uniq], float(b32)
        )
        return TermAutomatonSpec(
            tuple(t for t, _ in pairs),
            tuple(i for _, i in pairs),
            dfa.steps,
            dfa.accepts,
            dfa.any_sym,
            w,
            fld,
        )
    if isinstance(q, A.DisjunctionMaxQuery):
        subs = tuple(_recur(s, float(b32)) for s in q.queries)
        subs = tuple(s for s in subs if not isinstance(s, NoneSpec))
        return DisMaxSpec(subs, q.tie_breaker) if subs else NoneSpec()
    if isinstance(q, A.BooleanQuery):
        musts, shoulds, filters, nots = [], [], [], []
        for occ, sub in q.clauses:
            spec = _recur(sub, float(b32) if occ is not A.Occur.FILTER else 1.0)
            if occ is A.Occur.MUST:
                if isinstance(spec, NoneSpec):
                    return NoneSpec()
                musts.append(spec)
            elif occ is A.Occur.FILTER:
                if isinstance(spec, NoneSpec):
                    return NoneSpec()
                filters.append(spec)
            elif occ is A.Occur.SHOULD:
                if not isinstance(spec, NoneSpec):
                    shoulds.append(spec)
            else:
                if not isinstance(spec, NoneSpec):
                    nots.append(spec)
        if not musts and not filters and not shoulds:
            return NoneSpec()
        if q.minimum_should_match > len(shoulds):
            # Boolean2ScorerSupplier: optional.size() < minShouldMatch
            # → no scorer (BooleanWeight.java/Boolean2ScorerSupplier
            # .java:220-230). SHOULD clauses whose terms are absent
            # were dropped above; fewer survivors than msm can never
            # satisfy it — even when MUST/FILTER clauses match.
            return NoneSpec()
        return BoolSpec(tuple(musts), tuple(shoulds), tuple(filters), tuple(nots), q.minimum_should_match)
    raise TypeError(f"cannot compile {type(q)}")


def spec_terms(spec) -> set[str]:
    if isinstance(spec, (TermSpec,)):
        return {spec.term}
    if isinstance(
        spec,
        (SynonymSpec, ConstSpec, PhraseSpec, SpanNearSpec, IntervalSpec, PayloadSpec, TermAutomatonSpec),
    ):
        return set(spec.terms)
    if isinstance(spec, MultiPhraseSpec):
        return {t for slot in spec.slots for t in slot}
    if isinstance(spec, BoolSpec):
        out: set[str] = set()
        for group in (spec.musts, spec.shoulds, spec.filters, spec.nots):
            for s in group:
                out |= spec_terms(s)
        return out
    if isinstance(spec, DisMaxSpec):
        out = set()
        for s in spec.subs:
            out |= spec_terms(s)
        return out
    if isinstance(spec, tuple) and spec and spec[0] == "const":
        return spec_terms(spec[1])
    return set()


# ---- evaluation --------------------------------------------------------------


def _membership(sorted_docs: np.ndarray, cand: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """For each cand doc, (mask present in sorted_docs, index into it)."""
    idx = np.searchsorted(sorted_docs, cand)
    idx_c = np.minimum(idx, max(len(sorted_docs) - 1, 0))
    mask = (len(sorted_docs) > 0) & (idx < len(sorted_docs))
    if len(sorted_docs):
        mask = mask & (sorted_docs[idx_c] == cand)
    else:
        mask = np.zeros(len(cand), dtype=bool)
    return mask, idx_c


class ChunkContext:
    """Posting arrays visible to a kernel evaluation: term →
    (docs sorted int64, tfs, norms), plus the norm-inverse cache,
    optional per-term position lists (phrase queries), and (optionally)
    the full doc-id domain for MatchAllDocs."""

    def __init__(
        self,
        arrays: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]],
        cache: np.ndarray,
        all_docs: np.ndarray | None = None,
        positions: dict[str, list] | None = None,
        doc_range: tuple[int, int] | None = None,
        docsets: dict | None = None,
        sim=None,
        docvals: dict | None = None,
        payloads: dict | None = None,
    ):
        self.arrays = arrays
        self.cache = cache
        # pluggable Similarity (BM25 default); owns score(freq, norm)
        self.sim = sim if sim is not None else BM25_SIM
        self.all_docs = all_docs if all_docs is not None else EMPTY_I
        self.positions = positions or {}
        # [lo, hi) doc-id window of this chunk; None = whole corpus.
        # DocSetSpecs slice to it so chunk-parallel evaluation never
        # emits the same doc from two chunks.
        self.doc_range = doc_range
        # PredSpec key → this context's doc-id slice (chunk-local in
        # distributed mode; whole set in driver mode)
        self.docsets = docsets or {}
        # ValueSpec key → (docs int64, vals float64 [n, m]) slice
        self.docvals = docvals or {}
        # term → per-doc float32 payload arrays (position-aligned; the
        # .pay stream), present only when the query has a PayloadSpec
        self.payloads = payloads or {}
        # term → (flat positions, offsets[n+1]) memo (see _flat_of):
        # built lazily the first time a positional kernel touches the
        # term in this context, shared across slots/branches
        self.pos_flats: dict[str, tuple[np.ndarray, np.ndarray]] = {}

    def score(self, weight, freqs, norms, field: str) -> np.ndarray:
        """Vectorized SimScorer.score over this context's field table
        (PerFieldSimilarityWrapper resolves per field here)."""
        return self.sim.for_field(field).score(weight, freqs, norms, self.cache_for(field))

    def cache_for(self, field: str) -> np.ndarray:
        """Norm-inverse cache for a field ("" = primary). ``cache`` is
        a plain array (single-field index) or a field → array dict
        (multi-field: per-field avgdl ⇒ per-field cache)."""
        if isinstance(self.cache, dict):
            return self.cache[field]
        return self.cache

    def term(self, t: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        return self.arrays.get(t, (EMPTY_I, EMPTY_I, EMPTY_I))


MIN_NORMAL_F32 = float(np.finfo(np.float32).tiny)  # Float.MIN_NORMAL


def decode_feature_values(v: np.ndarray) -> np.ndarray:
    """FeatureField's store/decode round trip: the feature is stored IN
    the term frequency as floatToIntBits(value) >>> 15
    (FeatureField.java:196-202 FeatureTokenStream.incrementToken sets
    termFrequency) and decoded as intBitsToFloat(tf << 15)
    (:208-218 decodeFeatureValue) — i.e. the float32 mantissa truncated
    to its top 8 bits. Input float64/float32, output float32."""
    f = np.asarray(v, dtype=np.float32)
    bits = f.view(np.int32)
    return np.left_shift(np.right_shift(bits, 15), 15).view(np.float32)


def value_scores(kind: str, params: tuple, boost: float, vals: np.ndarray) -> np.ndarray:
    """Score per-doc value rows (float64 [n, m]) → float32, matching the
    reference's float semantics per function:
    - feature_linear: w * v, all-float32 arithmetic (FeatureField.java:
      231-239 LinearFunction)
    - feature_log: (float)(w * Math.log(a + v)) — double, f32 cast
      (:305-312 LogFunction)
    - feature_saturation: w * (1 - pivot/(v + pivot)), all-float32 —
      the monotonic rewrite (:373-387 SaturationFunction)
    - feature_sigmoid: (float)(w * (1 - pivot^a/(v^a + pivot^a))) —
      double, f32 cast (:441-450 SigmoidFunction)
    - dist_long: (float)(boost * (pivot / (pivot + |v - origin|)))
      (LongDistanceFeatureQuery.java:112-117)
    - dist_geo: boost * pivot_m / (pivot_m + haversine_m) over
      EARTH_MEAN_RADIUS (LatLonPointDistanceFeatureQuery role)."""
    if kind.startswith("feature_"):
        dec = decode_feature_values(vals[:, 0])
        fn = kind[len("feature_") :]
        w = np.float32(boost)
        if fn == "linear":
            return (w * dec).astype(np.float32)
        if fn == "log":
            (a,) = params
            return (float(boost) * np.log(float(a) + dec.astype(np.float64))).astype(np.float32)
        if fn == "saturation":
            (pivot,) = params
            p = np.float32(pivot)
            return (w * (np.float32(1.0) - p / (dec + p))).astype(np.float32)
        if fn == "sigmoid":
            pivot, a = params
            pa = float(pivot) ** float(a)
            f = dec.astype(np.float64)
            return (float(boost) * (1.0 - pa / (np.power(f, float(a)) + pa))).astype(np.float32)
        raise ValueError(f"unknown feature function {fn!r}")
    if kind == "dist_long":
        origin, pivot = params
        dist = np.abs(vals[:, 0] - float(origin))
        return (float(boost) * (float(pivot) / (float(pivot) + dist))).astype(np.float32)
    if kind == "dist_geo":
        from lucene_spark.search.geo import haversine_np

        lat, lon, pivot = params
        d = haversine_np(vals[:, 0], vals[:, 1], float(lat), float(lon))
        return (float(boost) * (float(pivot) / (float(pivot) + d))).astype(np.float32)
    raise ValueError(f"unknown value-score kind {kind!r}")


def evaluate(spec, ctx: ChunkContext) -> tuple[np.ndarray, np.ndarray]:
    """→ (docs sorted int64, scores float32) over the context's domain."""
    if isinstance(spec, NoneSpec):
        return EMPTY_I, EMPTY_F
    if isinstance(spec, AllSpec):
        return ctx.all_docs, np.full(len(ctx.all_docs), np.float32(spec.boost), dtype=np.float32)
    if isinstance(spec, TermSpec):
        docs, tfs, norms = ctx.term(spec.term)
        if not len(docs):
            return EMPTY_I, EMPTY_F
        return docs, ctx.score(spec.weight, tfs, norms, spec.field)
    if isinstance(spec, SynonymSpec):
        # union with per-doc tf sums (SynonymQuery.java:196-212)
        parts = [ctx.term(t) for t in spec.terms]
        parts = [p for p in parts if len(p[0])]
        if not parts:
            return EMPTY_I, EMPTY_F
        docs = np.unique(np.concatenate([p[0] for p in parts]))
        tf_sum = np.zeros(len(docs), dtype=np.int64)
        norms_out = np.zeros(len(docs), dtype=np.int64)
        for d, t, nm in parts:
            mask, idx = _membership(d, docs)
            tf_sum[mask] += t[idx[mask]]
            norms_out[mask] = nm[idx[mask]]
        return docs, ctx.score(spec.weight, tf_sum, norms_out, spec.field)
    if isinstance(spec, DocSetSpec):
        d = np.asarray(spec.docs, dtype=np.int64)
        if ctx.doc_range is not None:
            lo, hi = ctx.doc_range
            d = d[np.searchsorted(d, lo) : np.searchsorted(d, hi)]
        return d, np.full(len(d), np.float32(spec.boost), dtype=np.float32)
    if isinstance(spec, PredSpec):
        d = ctx.docsets.get(spec.key)
        d = EMPTY_I if d is None else np.asarray(d, dtype=np.int64)
        return d, np.full(len(d), np.float32(spec.boost), dtype=np.float32)
    if isinstance(spec, ValueSpec):
        if spec.key is not None:
            dv = ctx.docvals.get(spec.key)
            if dv is None:
                return EMPTY_I, EMPTY_F
            docs, vals = dv
        else:
            docs = np.asarray(spec.docs, dtype=np.int64)
            if not len(docs):
                return EMPTY_I, EMPTY_F
            vals = np.asarray(spec.vals, dtype=np.float64).reshape(len(docs), -1)
        if ctx.doc_range is not None:
            # like DocSetSpec above: a driver-resolved doc set must be
            # sliced to this chunk's window, or chunk-parallel scans
            # (distributed / sorted early-termination) emit the same
            # doc once per chunk
            lo, hi = ctx.doc_range
            a, b = np.searchsorted(docs, lo), np.searchsorted(docs, hi)
            docs, vals = docs[a:b], vals[a:b]
            if not len(docs):
                return EMPTY_I, EMPTY_F
        return docs, value_scores(spec.kind, spec.params, spec.boost, vals)
    if isinstance(spec, ConstSpec):
        parts = [ctx.term(t)[0] for t in spec.terms]
        parts = [p for p in parts if len(p)]
        if not parts:
            return EMPTY_I, EMPTY_F
        docs = np.unique(np.concatenate(parts))
        return docs, np.full(len(docs), np.float32(spec.boost), dtype=np.float32)
    if isinstance(spec, tuple) and spec and spec[0] == "const":
        docs, _ = evaluate(spec[1], ctx)
        return docs, np.full(len(docs), np.float32(spec[2]), dtype=np.float32)
    if isinstance(spec, DisMaxSpec):
        subs = [evaluate(s, ctx) for s in spec.subs]
        subs = [s for s in subs if len(s[0])]
        if not subs:
            return EMPTY_I, EMPTY_F
        docs = np.unique(np.concatenate([s[0] for s in subs]))
        mx = np.zeros(len(docs), dtype=np.float64)
        sm = np.zeros(len(docs), dtype=np.float64)
        for d, sc in subs:
            mask, idx = _membership(d, docs)
            v = sc[idx[mask]].astype(np.float64)
            sm[mask] += v
            np.maximum.at(mx, np.nonzero(mask)[0], v)
        return docs, (mx + (sm - mx) * spec.tie).astype(np.float32)
    if isinstance(spec, BoolSpec):
        return _evaluate_bool(spec, ctx)
    if isinstance(spec, PhraseSpec):
        return _evaluate_phrase(spec, ctx)
    if isinstance(spec, MultiPhraseSpec):
        return _evaluate_multiphrase(spec, ctx)
    if isinstance(spec, SpanNearSpec):
        return _evaluate_spannear(spec, ctx)
    if isinstance(spec, IntervalSpec):
        return _evaluate_interval(spec, ctx)
    if isinstance(spec, PayloadSpec):
        return _evaluate_payload(spec, ctx)
    if isinstance(spec, TermAutomatonSpec):
        return _evaluate_termautomaton(spec, ctx)
    raise TypeError(type(spec))


def _evaluate_termautomaton(spec: TermAutomatonSpec, ctx: ChunkContext) -> tuple[np.ndarray, np.ndarray]:
    """TermAutomatonScorer: union candidates, per-doc merged-position
    state walk. The per-candidate loop is Python by design parity —
    the reference itself is a merge-sort-positions-per-doc scorer and
    documents that it 'is likely slow' (TermAutomatonQuery.java:69-71);
    candidates are bounded by the union of the automaton's term
    postings, and each doc's walk is linear in its query-term
    occurrences (plus ANY gap spans)."""
    from lucene_spark.search.automaton import automaton_freq

    table = {(s, a): d for s, a, d in spec.steps}
    accepts = frozenset(spec.accepts)
    per_term = []
    for t, sym in zip(spec.terms, spec.syms):
        docs, tfs, norms = ctx.term(t)
        if len(docs):
            pos = ctx.positions[t]
            per_term.append((docs, norms, pos, sym))
    if not per_term:
        return EMPTY_I, EMPTY_F
    u_docs = np.unique(np.concatenate([p[0] for p in per_term]))
    n = len(u_docs)
    norms_out = np.zeros(n, dtype=np.int64)
    # per-doc (symbol, positions) lists, indexed by candidate slot
    doc_toks: list[list] = [[] for _ in range(n)]
    for docs, norms, pos, sym in per_term:
        mask, idx = _membership(docs, u_docs)
        cand_slots = np.nonzero(mask)[0]
        norms_out[mask] = norms[idx[mask]]
        for slot, row in zip(cand_slots, idx[mask]):
            doc_toks[slot].append((sym, pos[row]))
    freqs = np.zeros(n, dtype=np.float64)
    for j, toks in enumerate(doc_toks):
        if len(toks) == 1:
            sym, pos = toks[0]
            stream = [(int(p), sym) for p in pos]
        else:
            stream = sorted(
                (int(p), sym) for sym, pos in toks for p in pos
            )
        freqs[j] = automaton_freq(stream, table, accepts, spec.any_sym)
    m = freqs > 0
    if not m.any():
        return EMPTY_I, EMPTY_F
    return u_docs[m], ctx.score(
        spec.weight, freqs[m].astype(np.float32), norms_out[m], spec.field
    )


def _payload_segment_aggs(flat: np.ndarray, bounds: np.ndarray):
    """Per-segment (count, f32 sum, min, max) of the non-NaN entries of
    ``flat`` — the PayloadFunction running values (currentScore is
    sequential f32 accumulation; np.ufunc.reduceat IS sequential, so
    the f32 sums are bit-equal to the reference's within a segment).
    ``bounds`` are segment starts (each segment non-empty)."""
    valid = ~np.isnan(flat)
    cnt = np.add.reduceat(valid.astype(np.int64), bounds)
    sums = np.add.reduceat(np.where(valid, flat, np.float32(0.0)).astype(np.float32), bounds)
    mins = np.minimum.reduceat(np.where(valid, flat, np.float32(np.inf)), bounds)
    maxs = np.maximum.reduceat(np.where(valid, flat, np.float32(-np.inf)), bounds)
    return cnt, sums, mins, maxs


def _payload_factor(function: str, cnt, sums, mins, maxs) -> np.ndarray:
    """PayloadFunction.docScore (xxxPayloadFunction.java:39-43): docs
    with no collected payloads keep 1; negative (or NaN) truncates to 0
    (PayloadSpanScorer.getPayloadScore :250-257)."""
    f = np.ones(len(cnt), dtype=np.float32)
    has = cnt > 0
    if function == "sum":
        f[has] = sums[has]
    elif function == "min":
        f[has] = mins[has]
    elif function == "max":
        f[has] = maxs[has]
    else:  # avg: f32 sum / count (AveragePayloadFunction.java:39-41)
        f[has] = (sums[has] / cnt[has].astype(np.float32)).astype(np.float32)
    np.copyto(f, np.float32(0.0), where=~(f >= 0))  # catches negatives AND NaN
    return f


def _flat_payload_stream(ctx: ChunkContext, term: str):
    """(docs, tfs, norms, flat payload f32, per-doc start bounds)."""
    docs, tfs, norms = ctx.term(term)
    pays = ctx.payloads.get(term)
    if pays is None:
        raise ValueError(f"no payload stream for term {term!r} in this context")
    flat = (
        np.concatenate([np.asarray(p, dtype=np.float32) for p in pays])
        if len(pays)
        else np.empty(0, dtype=np.float32)
    )
    bounds = np.concatenate(([0], np.cumsum(tfs)[:-1])).astype(np.int64)
    return docs, tfs, norms, flat, bounds


def _evaluate_payload(spec: PayloadSpec, ctx: ChunkContext) -> tuple[np.ndarray, np.ndarray]:
    if spec.kind == "term":
        docs, tfs, norms, flat, bounds = _flat_payload_stream(ctx, spec.terms[0])
        if not len(docs):
            return EMPTY_I, EMPTY_F
        if spec.check is not None:
            keep = (~np.isnan(flat)) & (flat == np.float32(spec.check[0]))
            freq = np.add.reduceat(keep.astype(np.int64), bounds)
            m = freq > 0
            return docs[m], ctx.score(spec.weight, freq[m].astype(np.float32), norms[m], spec.field)
        cnt, sums, mins, maxs = _payload_segment_aggs(flat, bounds)
        factor = _payload_factor(spec.function, cnt, sums, mins, maxs)
        if not spec.include_span_score:
            return docs, factor
        span = ctx.score(spec.weight, tfs.astype(np.float32), norms, spec.field)
        return docs, (span * factor).astype(np.float32)
    if spec.kind == "or":
        parts = []
        for t in spec.terms:
            docs, tfs, norms, flat, bounds = _flat_payload_stream(ctx, t)
            if len(docs):
                parts.append((docs, tfs, norms, flat, bounds))
        if not parts:
            return EMPTY_I, EMPTY_F
        u_docs = np.unique(np.concatenate([p[0] for p in parts]))
        n = len(u_docs)
        freq = np.zeros(n, dtype=np.float64)
        norms_out = np.zeros(n, dtype=np.int64)
        cnt = np.zeros(n, dtype=np.int64)
        sums = np.zeros(n, dtype=np.float32)
        mins = np.full(n, np.float32(np.inf), dtype=np.float32)
        maxs = np.full(n, np.float32(-np.inf), dtype=np.float32)
        for docs, tfs, norms, flat, bounds in parts:
            mask, idx = _membership(docs, u_docs)
            src = idx[mask]
            if spec.check is not None:
                keep = (~np.isnan(flat)) & (flat == np.float32(spec.check[0]))
                freq[mask] += np.add.reduceat(keep.astype(np.int64), bounds)[src]
            else:
                freq[mask] += tfs[src]
                c, s, mn, mx = _payload_segment_aggs(flat, bounds)
                cnt[mask] += c[src]
                sums[mask] = (sums[mask] + s[src]).astype(np.float32)
                np.minimum.at(mins, np.nonzero(mask)[0], mn[src])
                np.maximum.at(maxs, np.nonzero(mask)[0], mx[src])
            norms_out[mask] = norms[src]
        if spec.check is not None:
            m = freq > 0
            return u_docs[m], ctx.score(
                spec.weight, freq[m].astype(np.float32), norms_out[m], spec.field
            )
        factor = _payload_factor(spec.function, cnt, sums, mins, maxs)
        if not spec.include_span_score:
            return u_docs, factor
        span = ctx.score(spec.weight, freq.astype(np.float32), norms_out, spec.field)
        return u_docs, (span * factor).astype(np.float32)
    # ---- exact ordered phrase span ------------------------------------------
    n_slots = len(spec.terms)
    slot_data = []
    for t in spec.terms:
        docs, tfs, norms, flat, bounds = _flat_payload_stream(ctx, t)
        if not len(docs):
            return EMPTY_I, EMPTY_F
        slot_data.append((docs, tfs, norms, flat, bounds))
    cand = slot_data[0][0]
    for docs, *_ in slot_data[1:]:
        cand = cand[np.isin(cand, docs, assume_unique=True)]
    if not len(cand):
        return EMPTY_I, EMPTY_F
    # composite key = cand_index * P + (pos - slot); P bounds positions
    pos_lists = {t: ctx.positions[t] for t in set(spec.terms)}
    keys_per_slot, pay_per_slot = [], []
    P = 0
    slot_flat = []
    for i, t in enumerate(spec.terms):
        docs, tfs, norms, flat_y, _ = slot_data[i]
        mask, idx = _membership(docs, cand)
        sel = idx[mask]  # every cand doc is present in every slot
        plist = pos_lists[t]
        sel_pos = [plist[j] for j in sel]
        lens = np.fromiter((len(x) for x in sel_pos), dtype=np.int64, count=len(sel))
        flat_p = np.concatenate(sel_pos) if len(sel_pos) else np.empty(0, dtype=np.int64)
        # payloads: slice the flat stream to the selected docs
        starts = np.concatenate(([0], np.cumsum(tfs)[:-1])).astype(np.int64)
        y_parts = [flat_y[starts[j] : starts[j] + tfs[j]] for j in sel]
        flat_yy = (
            np.concatenate(y_parts) if y_parts else np.empty(0, dtype=np.float32)
        )
        doc_ix = np.repeat(np.arange(len(cand), dtype=np.int64), lens)
        slot_flat.append((doc_ix, flat_p, flat_yy))
        if len(flat_p):
            P = max(P, int(flat_p.max()) + n_slots + 1)
    P = max(P, n_slots + 1)
    matched = None
    for i, (doc_ix, flat_p, _) in enumerate(slot_flat):
        keys = doc_ix * P + (flat_p - i)
        keys_per_slot.append(keys)
        matched = keys if matched is None else matched[np.isin(matched, keys, assume_unique=True)]
    if matched is None or not len(matched):
        return EMPTY_I, EMPTY_F
    # per-slot payloads of each matched span (keys are sorted per slot)
    span_pays = []
    for keys, (_, _, flat_yy) in zip(keys_per_slot, slot_flat):
        pos_in = np.searchsorted(keys, matched)
        span_pays.append(flat_yy[pos_in])
    doc_of = matched // P  # cand indices, sorted
    if spec.check is not None:
        kept = np.ones(len(matched), dtype=bool)
        for i, y in enumerate(span_pays):
            kept &= (~np.isnan(y)) & (y == np.float32(spec.check[i]))
        freq = np.bincount(doc_of[kept], minlength=len(cand))
        m = freq > 0
        norms_c = _phrase_norms(slot_data[0], cand)
        return cand[m], ctx.score(
            spec.weight, freq[m].astype(np.float32), norms_c[m], spec.field
        )
    mdocs = np.unique(doc_of)
    seg = np.searchsorted(doc_of, mdocs)
    cnt = np.zeros(len(mdocs), dtype=np.int64)
    sums = np.zeros(len(mdocs), dtype=np.float32)
    mins = np.full(len(mdocs), np.float32(np.inf), dtype=np.float32)
    maxs = np.full(len(mdocs), np.float32(-np.inf), dtype=np.float32)
    for y in span_pays:
        c, s, mn, mx = _payload_segment_aggs(y, seg)
        cnt += c
        sums = (sums + s).astype(np.float32)
        np.minimum(mins, mn, out=mins)
        np.maximum(maxs, mx, out=maxs)
    factor = _payload_factor(spec.function, cnt, sums, mins, maxs)
    freq = np.bincount(doc_of, minlength=len(cand))[mdocs].astype(np.float32)
    out_docs = cand[mdocs]
    norms_c = _phrase_norms(slot_data[0], cand)[mdocs]
    if not spec.include_span_score:
        return out_docs, factor
    span = ctx.score(spec.weight, freq, norms_c, spec.field)
    return out_docs, (span * factor).astype(np.float32)


def _phrase_norms(slot0, cand: np.ndarray) -> np.ndarray:
    """Norms of the candidate docs (from the first slot's postings)."""
    docs, _tfs, norms, _flat, _bounds = slot0
    mask, idx = _membership(docs, cand)
    return norms[idx[mask]]


def minimal_intervals(pos_lists: list[np.ndarray], in_order: bool) -> list[tuple[int, int]]:
    """Minimal intervals containing one occurrence of every list
    (ordered: occurrences strictly increasing in clause order).
    "Minimal" = no emitted interval nests inside another (the interval
    semantics of Intervals.ordered/unordered, Intervals.java;
    NearSpansOrdered.java:40 stretch-to-minimal loop). Returns
    (start, end) position pairs, start ascending."""
    n = len(pos_lists)
    out: list[tuple[int, int]] = []
    if any(len(p) == 0 for p in pos_lists):
        return out
    if in_order:
        first = pos_lists[0]
        i0 = 0
        while i0 < len(first):
            # forward greedy chain: each next term strictly after the
            # previous → the minimal end for any start >= first[i0]
            prev = int(first[i0])
            chain_ok = True
            for j in range(1, n):
                pj = pos_lists[j]
                k = int(np.searchsorted(pj, prev, side="right"))
                if k >= len(pj):
                    chain_ok = False
                    break
                prev = int(pj[k])
            if not chain_ok:
                break
            # backward maximization: latest chain reaching this end —
            # c_j = max position of list j strictly before c_{j+1}
            # (NearSpansOrdered.java:40 stretch-to-minimal role)
            c = prev
            for j in range(n - 2, -1, -1):
                pj = pos_lists[j]
                c = int(pj[int(np.searchsorted(pj, c, side="left")) - 1])
            out.append((c, prev))
            i0 = int(np.searchsorted(first, c, side="right"))
        return out
    # unordered: sliding window over the merged streams; a window is
    # emitted when advancing the minimum would grow the right edge
    # (equivalently: no later window nests inside it)
    idx = [0] * n
    cur = [int(p[0]) for p in pos_lists]
    hi = max(cur)
    pending: tuple[int, int] | None = None
    while True:
        lo_list = min(range(n), key=lambda i: cur[i])
        cand = (cur[lo_list], hi)
        idx[lo_list] += 1
        if idx[lo_list] >= len(pos_lists[lo_list]):
            out.append(cand)
            return out
        cur[lo_list] = int(pos_lists[lo_list][idx[lo_list]])
        if cur[lo_list] > hi:
            out.append(cand)
            hi = cur[lo_list]


def _mutual_pairs_py(a, b) -> list[tuple[int, int]]:
    """Minimal ordered 2-term intervals as (pa, pb) pairs: pb is the
    FIRST b after its nearest a-predecessor pa (the mutual-nearest
    characterization the gate oracle uses, fuzz-verified against
    minimal_intervals). Pure-int two-pointer — O(len(a)+len(b)) with no
    per-step numpy overhead (the same trick as the 2-slot sloppy
    kernel)."""
    out: list[tuple[int, int]] = []
    i, la = 0, len(a)
    prev_pa = -1
    for pb in b:
        while i < la and a[i] < pb:
            i += 1
        if i == 0:
            continue
        pa = a[i - 1]
        if pa != prev_pa:  # later pb with the same pa nests this one
            out.append((pa, pb))
            prev_pa = pa
    return out


def _mutual_pairs_flat(A: np.ndarray, B: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized :func:`_mutual_pairs_py` over FLAT (ci<<32 | pos) key
    arrays covering every candidate doc at once: mutual-nearest (a, b)
    pairs — b is the first B-key after a, a is the last A-key before b,
    both in the same doc. One searchsorted + two masks instead of a
    Python two-pointer per candidate."""
    if not len(A) or not len(B):
        return EMPTY_I, EMPTY_I
    j = np.searchsorted(B, A, side="right")
    valid = j < len(B)
    jc = np.minimum(j, len(B) - 1)
    valid &= (B[jc] >> 32) == (A >> 32)
    Ai, Bj = A[valid], B[jc[valid]]
    if not len(Ai):
        return EMPTY_I, EMPTY_I
    keep = np.ones(len(Bj), dtype=bool)
    keep[:-1] = Bj[1:] != Bj[:-1]  # duplicate next-b → keep the LAST a
    return Ai[keep], Bj[keep]


def _two_term_flat_freqs(
    A: np.ndarray, B: np.ndarray, in_order: bool, cap, n_cand: int
) -> np.ndarray:
    """Sloppy freqs (float32, per candidate index) of the 2-term
    ordered/unordered minimal-interval source over flat key arrays —
    the whole-corpus-at-once form of the per-candidate
    :func:`_two_term_minimal` loop (identical pair sets, identical
    float32 accumulation order: pairs are monotone per doc and the
    flat arrays are ci-major). ``cap`` = max gaps (None = unbounded).
    Cross-doc safety of the containment sweep: composite keys of a
    later doc are strictly larger, so the suffix-min can never mark a
    pair as containing one from another doc."""
    if in_order:
        S, E = _mutual_pairs_flat(A, B)
    else:
        s1, e1 = _mutual_pairs_flat(A, B)
        s2, e2 = _mutual_pairs_flat(B, A)
        S = np.concatenate([s1, s2])
        E = np.concatenate([e1, e2])
        if len(S) > 1:
            order = np.lexsort((E, S))
            S, E = S[order], E[order]
            dup = np.zeros(len(S), dtype=bool)
            dup[1:] = (S[1:] == S[:-1]) & (E[1:] == E[:-1])
            S, E = S[~dup], E[~dup]
            # drop pairs properly containing a later-sorted pair, and
            # same-start pairs longer than the first (the suffix-min +
            # same-start sweep of _two_term_minimal, vectorized)
            suf_excl = np.full(len(E), np.int64(2**62))
            if len(E) > 1:
                suf_excl[:-1] = np.minimum.accumulate(E[::-1])[::-1][1:]
            same_start = np.zeros(len(S), dtype=bool)
            same_start[1:] = S[1:] == S[:-1]
            keep = ~((suf_excl <= E) | same_start)
            S, E = S[keep], E[keep]
    freqs = np.zeros(n_cand, dtype=np.float32)
    if not len(S):
        return freqs
    gaps = E - S - 1  # same doc → high bits cancel
    if cap is not None:
        m = gaps <= cap
        S, gaps = S[m], gaps[m]
        if not len(S):
            return freqs
    ci = (S >> 32).astype(np.int64)
    contrib = np.float32(1.0) / (np.float32(1.0) + gaps.astype(np.float32))
    np.add.at(freqs, ci, contrib)  # sequential f32 adds in pair order
    return freqs


def _two_term_minimal(a, b, in_order: bool) -> list[tuple[int, int]]:
    """Minimal intervals for a 2-term ordered/unordered source over
    plain int lists. Unordered = union of both orientations with
    cross-orientation nesting removed."""
    if in_order:
        return _mutual_pairs_py(a, b)
    iv = _mutual_pairs_py(a, b) + _mutual_pairs_py(b, a)
    if len(iv) <= 1:
        return iv
    iv = sorted(set(iv))
    n = len(iv)
    suf = [1 << 62] * (n + 1)
    for i in range(n - 1, -1, -1):
        suf[i] = min(iv[i][1], suf[i + 1])
    out: list[tuple[int, int]] = []
    for i, (s, e) in enumerate(iv):
        if suf[i + 1] <= e:  # properly contains a later-sorted pair
            continue
        if out and out[-1][0] == s:  # shorter same-start already kept
            continue
        out.append((s, e))
    return out


def _evaluate_spannear(spec: SpanNearSpec, ctx: ChunkContext) -> tuple[np.ndarray, np.ndarray]:
    """Span-near over the positions index: candidate docs = term
    conjunction (position-filtered first, like the phrase kernels), then
    per-candidate minimal-interval matching; freq = Σ 1/(1+gaps) over
    matches with gaps = width - n_terms <= slop."""
    parts = [ctx.term(t) for t in spec.terms]
    if any(not len(p[0]) for p in parts):
        return EMPTY_I, EMPTY_F
    cand = parts[0][0]
    for d, _, _ in parts[1:]:
        cand = np.intersect1d(cand, d, assume_unique=True)
    if not len(cand):
        return EMPTY_I, EMPTY_F
    plists = []
    for t in spec.terms:
        plist = ctx.positions.get(t)
        if plist is None:
            raise ValueError(f"no positions available for term {t!r}")
        plists.append(plist)
    n = len(spec.terms)
    one = np.float32(1.0)
    freqs = np.zeros(len(cand), dtype=np.float64)
    keys = [_term_keys_ctx(ctx, t, cand) for t in spec.terms]
    fast_ok = len(set(spec.terms)) == n and not _keys_collide(keys)
    if fast_ok and n == 2:
        # flat vectorized fast path: every candidate in a handful of
        # numpy passes (same pair sets + float32 accumulation order as
        # the per-candidate two-pointer)
        freqs = _two_term_flat_freqs(
            keys[0], keys[1], spec.in_order, spec.slop, len(cand)
        ).astype(np.float64)
    elif fast_ok:
        # n >= 3 distinct terms: lockstep-vectorized minimal intervals
        kern = _ordered_flat_freqs if spec.in_order else _unordered_flat_freqs
        freqs = kern(keys, spec.slop, len(cand)).astype(np.float64)
    else:
        # repeated terms or co-positioned stacked tokens: per-candidate
        # tree path; gaps clamp at 0 (zero-width windows from posInc-0
        # stacks contribute 1/(1+0), the interval-evaluator convention)
        idxs = [np.searchsorted(p[0], cand) for p in parts]
        for ci in range(len(cand)):
            pls = [np.asarray(plists[j][idxs[j][ci]], dtype=np.int64) for j in range(n)]
            f = np.float32(0.0)
            for lo, hi in minimal_intervals(pls, spec.in_order):
                gaps = (hi - lo + 1) - n
                if gaps <= spec.slop:
                    f = np.float32(f + one / (one + np.float32(max(gaps, 0))))
            freqs[ci] = f
    matched = freqs > 0
    if not matched.any():
        return EMPTY_I, EMPTY_F
    docs0, _, norms0 = parts[0]
    idx0 = np.searchsorted(docs0, cand[matched])
    scores = ctx.score(spec.weight, freqs[matched], norms0[idx0], spec.field)
    return cand[matched], scores


def _fast_nterm_shape(src):
    """(slots, in_order, gaps_cap|None) when ``src`` is the common
    n-slot proximity shape — [maxgaps(g,)] ordered/unordered of n >= 2
    operands, each a bare term OR an or-of-terms (the surround QL's
    ``nW(a, OR(b, c))`` shape) — with all terms DISTINCT across slots;
    else None. Each slot is a tuple of terms; an or-slot's interval
    set is the plain union of its terms' positions (single positions
    never nest), so the flat kernels consume one merged key array per
    slot — the same union trick as multiphrase slots. Fuzz-verified
    freq-identical to eval_source over these shapes."""
    from lucene_spark.search.intervals import IMaxGaps, IOr, IOrdered, ITerm, IUnordered

    cap = None
    if isinstance(src, IMaxGaps):
        cap, src = src.gaps, src.source
    if isinstance(src, (IOrdered, IUnordered)) and len(src.sources) >= 2:
        slots = []
        for x in src.sources:
            if isinstance(x, ITerm):
                slots.append((x.term,))
            elif isinstance(x, IOr) and x.sources and all(
                isinstance(y, ITerm) for y in x.sources
            ):
                slots.append(tuple(y.term for y in x.sources))
            else:
                return None
        flat = [t for s in slots for t in s]
        if len(set(flat)) == len(flat):
            return tuple(slots), isinstance(src, IOrdered), cap
    return None


def _fast_or_shape(src):
    """([(slots, in_order, cap), ...], outer_cap) when ``src`` is
    [maxgaps(g,)] or(...) whose every branch is a fast n-slot shape, a
    bare term, or an or-of-terms — the Intervals.or / atLeast rewrite
    family (Intervals.java:127; flexible fn:atLeast lowers to
    or-of-unordered). Terms may REPEAT across branches (atLeast(2 of 3)
    shares every term pairwise); distinctness is only required within a
    branch (checked by :func:`_fast_nterm_shape`). None → tree
    evaluator."""
    from lucene_spark.search.intervals import IMaxGaps, IOr, ITerm

    cap = None
    if isinstance(src, IMaxGaps):
        cap, src = src.gaps, src.source
    if not isinstance(src, IOr) or not src.sources:
        return None
    branches = []
    for b in src.sources:
        if isinstance(b, ITerm):
            branches.append(("plain", (((b.term,),), True, None)))
            continue
        if isinstance(b, IOr) and b.sources and all(isinstance(y, ITerm) for y in b.sources):
            branches.append(("plain", ((tuple(y.term for y in b.sources),), True, None)))
            continue
        d = _fast_nterm_shape(b)
        if d is not None:
            branches.append(("plain", d))
            continue
        fd = _fast_filtered_shape(b)
        if fd is not None:
            # filtered combinator branch (notContaining / before / ...):
            # its interval set comes from the same range-count machinery
            branches.append(("filtered", fd))
            continue
        return None
    return branches, cap


def _filtered_intervals_from_keys(ffd, slot_keys, term_keys, n_cand: int):
    """Filtered-shape intervals (S, E, covered) from a
    :func:`_fast_filtered_shape` descriptor, or None on stacked-token
    key collisions (tree evaluator territory). ``slot_keys(slot)`` and
    ``term_keys(term)`` supply flat composite-key position arrays."""
    (slots, in_order, cap), kind, rterm, pre, post = ffd
    keys = [slot_keys(s) for s in slots]
    if _keys_collide(keys) or (
        rterm is not None
        and rterm[0] == "pairs"
        and _keys_collide([slot_keys(s) for s in rterm[1][0]])
    ):
        return None
    if len(slots) == 1:
        S = E = keys[0]
        covered = 1
    else:
        coll = _ordered_flat_intervals if in_order else _unordered_flat_intervals
        S, E = coll(keys, cap, n_cand)
        covered = len(slots)
    if len(S):
        if kind == "endingwithin":
            # SpanFirst/position-range: exclusive span end <= limit
            # (pre carries the limit, post the minimum start)
            keep = ((E & _LOW32) + 1) <= pre
            if post:
                keep &= (S & _LOW32) >= post
        elif rterm[0] == "pairs":
            rslots, r_order, r_cap = rterm[1]
            rkeys = [slot_keys(s) for s in rslots]
            rcoll = _ordered_flat_intervals if r_order else _unordered_flat_intervals
            Sr, Er = rcoll(rkeys, r_cap, n_cand)
            if len(Sr):
                pref = np.maximum.accumulate(Er)
                idx = np.searchsorted(Sr, S, side="right") - 1
                valid = idx >= 0
                exists = np.zeros(len(S), dtype=bool)
                exists[valid] = pref[idx[valid]] >= E[valid]
            else:
                exists = np.zeros(len(S), dtype=bool)
            keep = exists if kind == "containedby" else ~exists
        else:
            keep = _filtered_interval_keep(S, E, term_keys(rterm[1]), kind, pre, post)
        S, E = S[keep], E[keep]
    return S, E, covered


def _or_flat_freqs(
    branch_ivs: list[tuple[np.ndarray, np.ndarray, int]], outer_cap, n_cand: int
) -> np.ndarray:
    """Union-minimalize branch interval sets and accumulate freqs —
    the vectorized twin of intervals._minimalize + the per-interval
    1/(1+gaps) accumulation (DisjunctionIntervalsSource semantics:
    dedupe identical spans keeping max covered, drop spans properly
    containing another span of the union). All arrays are composite
    doc<<32|pos keys, so every comparison is automatically per-doc
    (doc bits dominate — a later doc's end can never fake containment
    in an earlier doc)."""
    parts = [(S, E, c) for S, E, c in branch_ivs if len(S)]
    freqs = np.zeros(n_cand, dtype=np.float32)
    if not parts:
        return freqs
    S = np.concatenate([p[0] for p in parts])
    E = np.concatenate([p[1] for p in parts])
    C = np.concatenate([np.full(len(p[0]), p[2], dtype=np.int64) for p in parts])
    order = np.lexsort((-C, E, S))
    S, E, C = S[order], E[order], C[order]
    # dedupe identical (start, end): first occurrence carries max covered
    keep = np.ones(len(S), dtype=bool)
    keep[1:] = (S[1:] != S[:-1]) | (E[1:] != E[:-1])
    S, E, C = S[keep], E[keep], C[keep]
    # same start: the shortest end survives (a longer same-start span
    # properly contains it)
    keep = np.ones(len(S), dtype=bool)
    keep[1:] = S[1:] != S[:-1]
    S, E, C = S[keep], E[keep], C[keep]
    # (s,e) properly contains a later-starting span iff some later row
    # has end <= e — suffix-min of ends, excluding self
    if len(S) > 1:
        sufmin = np.minimum.accumulate(E[::-1])[::-1]
        nxt = np.empty(len(S), dtype=np.int64)
        nxt[:-1] = sufmin[1:]
        nxt[-1] = np.iinfo(np.int64).max
        keep = nxt > E
        S, E, C = S[keep], E[keep], C[keep]
    width_minus_c = (E & _LOW32) - (S & _LOW32) + 1 - C
    if outer_cap is not None:
        ok = width_minus_c <= outer_cap
        S, width_minus_c = S[ok], width_minus_c[ok]
    if not len(S):
        return freqs
    gaps = np.maximum(width_minus_c, 0).astype(np.float32)
    one = np.float32(1.0)
    np.add.at(freqs, (S >> np.int64(32)).astype(np.int64), one / (one + gaps))
    return freqs


def _fast_filtered_shape(src):
    """Descriptor for filtered combinators whose positive operand is a
    fast shape (bare term, or [maxgaps] ordered/unordered of distinct
    terms) and whose filter operand is a bare or extend-wrapped term:
    ((terms, in_order, cap), kind, ref_term, pre, post), else None.

    Every such filter reduces to a per-interval RANGE COUNT of the
    reference term's positions over the flat composite keys — e.g.
    notContaining keeps [s,e] with no ref position in [s+pre, e-post]
    (an extended subtrahend [p-pre, p+post] nests iff p lands there) —
    so the whole evaluation is searchsorted arithmetic, no per-doc
    Python (VERDICT r2: the last per-candidate loops in the query
    path)."""
    from lucene_spark.search.intervals import (
        IAfter,
        IBefore,
        IContainedBy,
        IContaining,
        IExtend,
        INonOverlapping,
        INotContainedBy,
        INotContaining,
        IOverlapping,
        ITerm,
    )

    kinds = {
        INotContaining: ("notcontaining", "minuend", "subtrahend"),
        IContaining: ("containing", "big", "small"),
        INonOverlapping: ("nonoverlapping", "minuend", "subtrahend"),
        IOverlapping: ("overlapping", "source", "reference"),
        IBefore: ("before", "source", "reference"),
        IAfter: ("after", "source", "reference"),
        IContainedBy: ("containedby", "small", "big"),
        INotContainedBy: ("notcontainedby", "small", "big"),
    }
    from lucene_spark.search.intervals import IEndingWithin, IPositionRange

    if isinstance(src, (IEndingWithin, IPositionRange)):
        # unary position filters: pre carries the exclusive end limit,
        # post the minimum start (0 for SpanFirst/IEndingWithin)
        lo = src.start if isinstance(src, IPositionRange) else 0
        pos_op = src.source
        if isinstance(pos_op, ITerm):
            return (((pos_op.term,),), True, None), "endingwithin", None, src.limit, lo
        pd = _fast_nterm_shape(pos_op)
        if pd is None:
            return None
        return pd, "endingwithin", None, src.limit, lo
    info = kinds.get(type(src))
    if info is None:
        return None
    kind, pos_attr, ref_attr = info
    pos_op, ref_op = getattr(src, pos_attr), getattr(src, ref_attr)
    pre = post = 0
    if isinstance(ref_op, IExtend):
        pre, post, ref_op = ref_op.before, ref_op.after, ref_op.source
    if isinstance(pos_op, ITerm):
        pos_descr = (((pos_op.term,),), True, None)
    else:
        pos_descr = _fast_nterm_shape(pos_op)
        if pos_descr is None:
            return None
    if isinstance(ref_op, ITerm):
        return pos_descr, kind, ("term", ref_op.term), pre, post
    if kind in ("containedby", "notcontainedby") and pre == 0 and post == 0:
        # containment in a PAIR-SOURCE big (Intervals.within shape):
        # exists big with S <= s and e <= E ⇔ prefix-max of big ends
        # over bigs with start <= s reaches e (composite keys keep the
        # test doc-local for free)
        ref_descr = _fast_nterm_shape(ref_op)
        if ref_descr is not None:
            return pos_descr, kind, ("pairs", ref_descr), 0, 0
    return None


def _filtered_interval_keep(
    S: np.ndarray, E: np.ndarray, Kc: np.ndarray, kind: str, pre: int, post: int
) -> np.ndarray:
    """Boolean keep-mask over minimal intervals (composite-key S/E) for
    one filtered combinator with a (pre, post)-extended single-position
    reference whose flat sorted keys are ``Kc``. Every reference point
    p yields the widened interval [max(0, p-pre), p+post] and ALL of
    them participate (ExtendedIntervalIterator.java:52-79 streams
    without re-minimalizing; NonOverlappingIntervalsSource.java:64-80
    checks every subtrahend interval), incl. the zero-start containment
    special case for clipped points."""
    sp = (S & _LOW32).astype(np.int64)
    ep = (E & _LOW32).astype(np.int64)
    hi_doc = S & ~_LOW32

    def _exists(lo, hi):
        lo_c = np.maximum(lo, 0)
        rng_valid = (hi >= lo_c) & (hi >= 0)
        hi_c = np.clip(hi, 0, int(_LOW32))
        cnt = np.searchsorted(Kc, hi_doc | hi_c, side="right") - np.searchsorted(
            Kc, hi_doc | lo_c, side="left"
        )
        return rng_valid & (cnt > 0)

    if kind in ("notcontaining", "containing"):
        # [max(0, p-pre), p+post] nests in [s,e] ⇔ p in [s+pre, e-post];
        # a CLIPPED point (p < pre, start 0) nests iff s == 0 and
        # p + post <= e
        exists = _exists(sp + pre, ep - post)
        if pre > 0:
            clip = _exists(
                np.zeros(len(S), dtype=np.int64),
                np.minimum(np.int64(pre - 1), ep - post),
            )
            exists = exists | (clip & (sp == 0))
    elif kind in ("nonoverlapping", "overlapping"):
        exists = _exists(sp - post, ep + pre)
    elif kind in ("containedby", "notcontainedby"):
        exists = _exists(ep - post, sp + pre)
    elif kind == "before":
        exists = _exists(ep + pre + 1, np.full(len(S), int(_LOW32), dtype=np.int64))
    else:  # after
        exists = _exists(np.zeros(len(S), dtype=np.int64), sp - post - 1)
    if kind in ("containing", "overlapping", "before", "after", "containedby"):
        return exists
    return ~exists


def _evaluate_interval(spec: IntervalSpec, ctx: ChunkContext) -> tuple[np.ndarray, np.ndarray]:
    """Interval-algebra kernel: doc-level candidate pruning via the
    source's conjunction/union structure, then per-candidate minimal-
    interval evaluation over the positions index. freq accumulates
    1/(1 + gaps) per emitted interval with gaps = max(0, width -
    covered) (overlapping unordered operands can cover more than the
    width; clamped like SloppyPhraseMatcher clamps negative slop)."""
    from lucene_spark.search.intervals import candidate_docs, eval_source

    def _score(freq_arr: np.ndarray, norm_arr: np.ndarray) -> np.ndarray:
        if spec.score_mode == "saturation":
            # IntervalScoreFunction.SaturationFunction: weight *
            # (1 - pivot/(freq + pivot)) in float32, norm-free
            f = freq_arr.astype(np.float32)
            p = np.float32(spec.pivot)
            return (np.float32(spec.weight) * (np.float32(1.0) - p / (f + p))).astype(
                np.float32
            )
        return ctx.score(spec.weight, freq_arr, norm_arr, spec.field)

    parts = {t: ctx.term(t) for t in spec.terms}
    doc_arrays = {t: p[0] for t, p in parts.items()}
    cand = candidate_docs(spec.source, doc_arrays)
    if cand is None or not len(cand):
        return EMPTY_I, EMPTY_F
    # per-term row index of each candidate (−1 = doc absent from term)
    idxs: dict[str, np.ndarray] = {}
    present: dict[str, np.ndarray] = {}
    plists: dict[str, object] = {}
    for t in spec.terms:
        d = doc_arrays[t]
        i = np.searchsorted(d, cand)
        i_clip = np.minimum(i, max(len(d) - 1, 0))
        present[t] = (len(d) > 0) & (d[i_clip] == cand) if len(d) else np.zeros(len(cand), bool)
        idxs[t] = i_clip
        pl = ctx.positions.get(t)
        if pl is None and len(d):
            raise ValueError(f"no positions available for term {t!r}")
        plists[t] = pl
    one = np.float32(1.0)
    empty = np.empty(0, dtype=np.int64)
    freqs = np.zeros(len(cand), dtype=np.float64)
    norms = np.zeros(len(cand), dtype=np.int64)
    has_norm = np.zeros(len(cand), dtype=bool)
    def _slot_keys(slot):
        ks = [_term_keys_ctx(ctx, t, cand) for t in slot if len(doc_arrays[t])]
        ks = [k for k in ks if len(k)]
        if not ks:
            return EMPTY_I
        return ks[0] if len(ks) == 1 else np.unique(np.concatenate(ks))

    def _slot_norms(slot, matched):
        """per-matched-doc norm from any slot term present (norms are
        per doc; every matched doc holds >= 1 term of the slot)."""
        mc = cand[matched]
        norms_m = np.zeros(len(mc), dtype=np.int64)
        got = np.zeros(len(mc), dtype=bool)
        for t in slot:
            d, _, nm = parts[t]
            if len(d):
                mask, idx = _membership(d, mc)
                fill = mask & ~got
                norms_m[fill] = nm[idx[fill]]
                got |= mask
        return norms_m

    fast = _fast_nterm_shape(spec.source)
    if fast is not None:
        slots, in_order, cap = fast
        keys = [_slot_keys(s) for s in slots]
        if _keys_collide(keys):
            fast = None  # co-positioned stacked tokens → tree evaluator
    if fast is not None:
        slots, in_order, cap = fast
        if len(slots) == 2 and all(len(s) == 1 for s in slots):
            freqs = _two_term_flat_freqs(keys[0], keys[1], in_order, cap, len(cand)).astype(
                np.float64
            )
        else:
            kern = _ordered_flat_freqs if in_order else _unordered_flat_freqs
            freqs = kern(keys, cap, len(cand)).astype(np.float64)
        matched = freqs > 0
        if not matched.any():
            return EMPTY_I, EMPTY_F
        norms_m = _slot_norms(slots[0], matched)
        scores = _score(freqs[matched], norms_m)
        return cand[matched], scores
    def _term_keys(t):
        return _term_keys_ctx(ctx, t, cand)

    def _ff_branch_ivs(ffd):
        return _filtered_intervals_from_keys(ffd, _slot_keys, _term_keys, len(cand))

    ff = _fast_filtered_shape(spec.source)
    ffres = _ff_branch_ivs(ff) if ff is not None else None
    if ffres is not None:
        S, E, covered = ffres
        if not len(S):
            return EMPTY_I, EMPTY_F
        gaps = np.maximum((E & _LOW32) - (S & _LOW32) + 1 - covered, 0)
        freqs = np.zeros(len(cand), dtype=np.float32)
        contrib = np.float32(1.0) / (np.float32(1.0) + gaps.astype(np.float32))
        # S is per-doc start-ascending → sequential f32 adds in the
        # same order as the per-doc tree evaluator
        np.add.at(freqs, (S >> np.int64(32)).astype(np.int64), contrib)
        freqs = freqs.astype(np.float64)
        matched = freqs > 0
        if not matched.any():
            return EMPTY_I, EMPTY_F
        norms_m = _slot_norms(ff[0][0][0], matched)
        scores = _score(freqs[matched], norms_m)
        return cand[matched], scores
    orr = _fast_or_shape(spec.source) if ff is None else None
    if orr is not None:
        branches, outer_cap = orr
        branch_ivs = []
        for tag, descr in branches:
            if tag == "filtered":
                res = _ff_branch_ivs(descr)
                if res is None:
                    branch_ivs = None
                    break
                branch_ivs.append(res)
                continue
            slots, in_order, cap = descr
            keys = [_slot_keys(s) for s in slots]
            if _keys_collide(keys):
                branch_ivs = None  # co-positioned stacked tokens → tree
                break
            if len(slots) == 1:
                K = keys[0]
                branch_ivs.append((K, K, 1))
            else:
                coll = _ordered_flat_intervals if in_order else _unordered_flat_intervals
                S, E = coll(keys, cap, len(cand))
                branch_ivs.append((S, E, len(slots)))
        if branch_ivs is not None:
            freqs = _or_flat_freqs(branch_ivs, outer_cap, len(cand)).astype(np.float64)
            matched = freqs > 0
            if not matched.any():
                return EMPTY_I, EMPTY_F
            norms_m = _slot_norms(tuple(spec.terms), matched)
            scores = _score(freqs[matched], norms_m)
            return cand[matched], scores
    for ci in range(len(cand)):

        def pos_of(t: str, _ci=ci):
            if not present[t][_ci]:
                return empty
            return np.asarray(plists[t][idxs[t][_ci]], dtype=np.int64)

        f = np.float32(0.0)
        for s, e, c in eval_source(spec.source, pos_of):
            gaps = max(0, (e - s + 1) - c)
            f = np.float32(f + one / (one + np.float32(gaps)))
        freqs[ci] = f
        if f > 0 and not has_norm[ci]:
            for t in spec.terms:  # norm from any term containing the doc
                if present[t][ci]:
                    norms[ci] = parts[t][2][idxs[t][ci]]
                    has_norm[ci] = True
                    break
    matched = freqs > 0
    if not matched.any():
        return EMPTY_I, EMPTY_F
    scores = _score(freqs[matched], norms[matched])
    return cand[matched], scores


def _slot_union(ctx: ChunkContext, slot: tuple[str, ...]):
    """Merged (docs, norms, per-doc sorted position arrays) over a
    slot's alternative terms (UnionPostingsEnum in MultiPhraseQuery)."""
    parts = []
    for t in slot:
        d, _, nm = ctx.term(t)
        if len(d):
            pl = ctx.positions.get(t)
            if pl is None:
                raise ValueError(f"no positions for term {t!r}")
            parts.append((d, nm, pl))
    if not parts:
        return EMPTY_I, EMPTY_I, []
    docs = np.unique(np.concatenate([p[0] for p in parts]))
    norms = np.zeros(len(docs), dtype=np.int64)
    positions = [None] * len(docs)
    for d, nm, pl in parts:
        mask, idx = _membership(d, docs)
        norms[mask] = nm[idx[mask]]
        for di in np.nonzero(mask)[0]:
            mine = pl[idx[di]]
            positions[di] = mine if positions[di] is None else np.union1d(positions[di], mine)
    return docs, norms, positions


def _evaluate_multiphrase(spec: MultiPhraseSpec, ctx: ChunkContext) -> tuple[np.ndarray, np.ndarray]:
    if spec.slop == 0:
        # vectorized: slot doc-union + flattened key unions, no per-doc loop
        slot_docs = []
        for slot in spec.slots:
            ds = [ctx.term(t)[0] for t in slot if len(ctx.term(t)[0])]
            if not ds:
                return EMPTY_I, EMPTY_F
            slot_docs.append(ds[0] if len(ds) == 1 else np.unique(np.concatenate(ds)))
        cand = slot_docs[0]
        for d in slot_docs[1:]:
            cand = np.intersect1d(cand, d, assume_unique=True)
        if not len(cand):
            return EMPTY_I, EMPTY_F
        keys = []
        for slot in spec.slots:
            parts = []
            for t in slot:
                d = ctx.term(t)[0]
                if not len(d):
                    continue
                pl = ctx.positions.get(t)
                if pl is None:
                    raise ValueError(f"no positions for term {t!r}")
                k = _term_keys_ctx(ctx, t, cand)
                if len(k):
                    parts.append(k)
            if not parts:
                return EMPTY_I, EMPTY_F
            keys.append(parts[0] if len(parts) == 1 else np.unique(np.concatenate(parts)))
        freqs = _exact_phrase_freqs_keys(keys, len(cand))
        matched = freqs > 0
        if not matched.any():
            return EMPTY_I, EMPTY_F
        # norms of the matched docs from any slot-0 term containing them
        norms_out = np.zeros(len(cand), dtype=np.int64)
        for t in spec.slots[0]:
            d, _, nm = ctx.term(t)
            if len(d):
                mask, idx = _membership(d, cand)
                norms_out[mask] = nm[idx[mask]]
        scores = ctx.score(spec.weight, freqs[matched], norms_out[matched], spec.field)
        return cand[matched], scores

    slots = [_slot_union(ctx, s) for s in spec.slots]
    if any(not len(s[0]) for s in slots):
        return EMPTY_I, EMPTY_F
    cand = slots[0][0]
    for d, _, _ in slots[1:]:
        cand = np.intersect1d(cand, d, assume_unique=True)
    if not len(cand):
        return EMPTY_I, EMPTY_F
    # disjoint slots → exact simple matcher over slot unions; slots that
    # SHARE a term run the exact multi-term repeat-group algorithm
    # (hasMultiTermRpts, SloppyPhraseMatcher.java:435-453,562-585)
    all_terms = [t for slot in spec.slots for t in slot]
    disjoint = len(set(all_terms)) == len(all_terms)
    if disjoint:
        # lockstep-vectorized PQ over the slot-union key streams (the
        # UnionPostingsEnum merge as one flat sorted array per slot) —
        # no per-candidate Python; bit-equal to _sloppy_freq_exact
        keys = []
        for slot in spec.slots:
            parts = []
            for t in slot:
                d = ctx.term(t)[0]
                if len(d):
                    pl = ctx.positions.get(t)
                    if pl is None:
                        raise ValueError(f"no positions for term {t!r}")
                    k = _term_keys_ctx(ctx, t, cand)
                    if len(k):
                        parts.append(k)
            keys.append(parts[0] if len(parts) == 1 else np.unique(np.concatenate(parts)))
        freqs = _sloppy_flat_freqs_n(keys, spec.slop, len(cand)).astype(np.float64)
    else:
        pos_lists = []
        for d, _, pl in slots:
            idx = np.searchsorted(d, cand)
            pos_lists.append([pl[i] for i in idx])
        freqs = np.zeros(len(cand), dtype=np.float64)
        for ci in range(len(cand)):
            plc = [np.asarray(pl[ci]) for pl in pos_lists]
            freqs[ci] = _lucene_sloppy_freq(plc, spec.slop, slot_terms=spec.slots)
    matched = freqs > 0
    if not matched.any():
        return EMPTY_I, EMPTY_F
    d0, nm0, _ = slots[0]
    idx0 = np.searchsorted(d0, cand[matched])
    scores = ctx.score(spec.weight, freqs[matched], nm0[idx0], spec.field)
    return cand[matched], scores


def _evaluate_phrase(spec: PhraseSpec, ctx: ChunkContext) -> tuple[np.ndarray, np.ndarray]:
    """ExactPhraseMatcher semantics (ExactPhraseMatcher.java:39,109):
    candidate docs = conjunction of all phrase terms; phrase freq =
    #positions p of term0 with p+i present for every term i. The freq
    then feeds BM25 with the summed-idf weight (PhraseWeight).

    slop > 0 (SloppyPhraseMatcher.java:53): for every occurrence p of
    the first term, greedily align each later term i to its position
    nearest p+i; a match needs total displacement d <= slop and
    contributes sloppyFreq = 1/(1+d) (Similarity.SloppySimScorer
    weighting). This reproduces Lucene's scoring for non-repeating
    phrase terms (the common case); Lucene's full repeat-group handling
    (SloppyPhraseMatcher.java:200+) is not replicated. slop=0 reduces
    exactly to the exact matcher (d must be 0)."""
    parts = [ctx.term(t) for t in spec.terms]
    if any(not len(p[0]) for p in parts):
        return EMPTY_I, EMPTY_F
    cand = parts[0][0]
    for d, _, _ in parts[1:]:
        cand = np.intersect1d(cand, d, assume_unique=True)
    if not len(cand):
        return EMPTY_I, EMPTY_F
    plists = []
    for t in spec.terms:
        plist = ctx.positions.get(t)
        if plist is None:
            raise ValueError(f"no positions available for term {t!r}")
        plists.append(plist)
    if spec.slop == 0:
        keys = [_term_keys_ctx(ctx, t, cand) for t in spec.terms]
        freqs = _exact_phrase_freqs_keys(keys, len(cand))
    elif len(spec.terms) == 2 and spec.terms[0] != spec.terms[1]:
        # flat vectorized 2-slot sloppy matcher (the dominant shape)
        A = _term_keys_ctx(ctx, spec.terms[0], cand)
        B = _term_keys_ctx(ctx, spec.terms[1], cand)
        freqs = _sloppy2_flat_freqs(A, B, spec.slop, len(cand)).astype(np.float64)
    elif len(set(spec.terms)) == len(spec.terms):
        # n >= 3 distinct terms: lockstep-vectorized PQ (no repeats —
        # initSimple branch), every candidate doc advanced per numpy pass
        keys = [_term_keys_ctx(ctx, t, cand) for t in spec.terms]
        freqs = _sloppy_flat_freqs_n(keys, spec.slop, len(cand)).astype(np.float64)
    else:
        # repeating terms: per-candidate exact PQ with repeat groups
        pos_lists = []
        for (d, _, _), plist in zip(parts, plists):
            idx = np.searchsorted(d, cand)
            pos_lists.append([plist[i] for i in idx])
        freqs = np.zeros(len(cand), dtype=np.float64)
        for ci in range(len(cand)):
            freqs[ci] = _sloppy_freq_exact(
                [pl[ci] for pl in pos_lists], spec.slop, terms=spec.terms
            )
    matched = freqs > 0
    if not matched.any():
        return EMPTY_I, EMPTY_F
    docs0, _, norms0 = parts[0]
    idx0 = np.searchsorted(docs0, cand[matched])
    scores = ctx.score(spec.weight, freqs[matched], norms0[idx0], spec.field)
    return cand[matched], scores


def _term_flat_keys(d: np.ndarray, plist: list, cand: np.ndarray) -> np.ndarray:
    """Sorted flattened (cand_index << 32 | position) keys of one term's
    occurrences restricted to the candidate docs (positions < 2^32 —
    Lucene caps per-doc positions at Integer.MAX_VALUE)."""
    mask, idx = _membership(d, cand)
    ci = np.nonzero(mask)[0].astype(np.int64)
    sel = idx[mask]
    lens = np.fromiter((len(plist[i]) for i in sel), dtype=np.int64, count=len(sel))
    if not int(lens.sum()):
        return EMPTY_I
    di = np.repeat(ci, lens)
    pos = np.concatenate([np.asarray(plist[i], dtype=np.int64) for i in sel if len(plist[i])])
    return (di << np.int64(32)) | pos


def _flat_of(ctx: "ChunkContext", t: str) -> tuple[np.ndarray, np.ndarray]:
    """(flat concatenated positions, doc-boundary offsets[n+1]) of one
    term's position lists — built once per (context, term) and
    memoized, so positional shapes that touch the same term from
    several slots/branches (IOr of unordered pairs, repeated-term
    phrases) never re-flatten it. Offsets come from the tf array (a
    term's per-doc position-list length IS its tf); the flat array is
    zero-copy when the per-doc lists are np.split views of one decode
    buffer (unpack_positions' output shape)."""
    fo = ctx.pos_flats.get(t)
    if fo is not None:
        return fo
    plist = ctx.positions.get(t) or []
    tfs = ctx.term(t)[1]
    offs = np.zeros(len(plist) + 1, dtype=np.int64)
    if len(plist):
        np.cumsum(np.asarray(tfs[: len(plist)], dtype=np.int64), out=offs[1:])
    total = int(offs[-1])
    if total == 0:
        fo = (EMPTY_I, offs)
    else:
        # zero-copy fast path: unpack_positions carries its flat decode
        # buffer on the returned PositionLists — the contiguity
        # invariant is established at creation, not re-proved here.
        # O(1) sanity: the stashed buffer must be the views' base and
        # cover exactly ``total`` entries (derived shapes — slices,
        # tier concatenations — are plain lists and take the copy path)
        flat = getattr(plist, "flat", None)
        if not (
            flat is not None
            and len(flat) == total
            and len(plist)
            and isinstance(plist[0], np.ndarray)
            and plist[0].base is flat
        ):
            flat = np.concatenate(
                [np.asarray(p, dtype=np.int64) for p in plist if len(p)]
            )
        fo = (flat, offs)
    ctx.pos_flats[t] = fo
    return fo


def _keys_from_flat(
    d: np.ndarray, flat: np.ndarray, offs: np.ndarray, cand: np.ndarray
) -> np.ndarray:
    """_term_flat_keys over the flattened representation: a pure
    vectorized ragged gather (no per-doc Python), same sorted
    (cand_index << 32 | position) output."""
    mask, idx = _membership(d, cand)
    ci = np.nonzero(mask)[0].astype(np.int64)
    sel = idx[mask]
    if not len(sel):
        return EMPTY_I
    starts = offs[sel]
    lens = offs[sel + 1] - starts
    tot = int(lens.sum())
    if not tot:
        return EMPTY_I
    di = np.repeat(ci, lens)
    cum = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=cum[1:])
    within = np.arange(tot, dtype=np.int64) - np.repeat(cum, lens)
    pos = flat[np.repeat(starts, lens) + within]
    return (di << np.int64(32)) | pos


def _term_keys_ctx(ctx: "ChunkContext", t: str, cand: np.ndarray) -> np.ndarray:
    """Context-aware _term_flat_keys: memoized flat representation +
    vectorized gather."""
    flat, offs = _flat_of(ctx, t)
    return _keys_from_flat(ctx.term(t)[0], flat, offs, cand)


def _exact_phrase_freqs_keys(key_arrays: list[np.ndarray], n_cand: int) -> np.ndarray:
    """Vectorized exact-phrase frequencies over ALL candidate docs at
    once: each slot is one sorted (doc << 32 | position) key array; one
    searchsorted membership test per slot instead of a Python loop per
    doc — the block-at-a-time replacement for doc-at-a-time iteration
    (SURVEY §4.2 disposition of ExactPhraseMatcher.java)."""
    alive = key_arrays[0]
    for i in range(1, len(key_arrays)):
        if not len(alive):
            break
        ki = key_arrays[i]
        if not len(ki):
            return np.zeros(n_cand, dtype=np.float64)
        want = alive + i  # position + i within the same doc
        j = np.searchsorted(ki, want)
        jc = np.minimum(j, len(ki) - 1)
        alive = alive[(j < len(ki)) & (ki[jc] == want)]
    return np.bincount(alive >> np.int64(32), minlength=n_cand).astype(np.float64)


def _lucene_sloppy_freq(
    pos_lists: list, slop: int, terms: tuple | None = None, slot_terms: tuple | None = None
) -> np.float32:
    """Exact replication of the reference sloppy matcher semantics
    (SloppyPhraseMatcher.java:162-205 nextMatch loop, PhrasePositions.java
    position = pos - offset, PhraseQueue.java (position, offset, ord)
    ordering; freq accumulation PhraseScorer.java:75-79 in float32,
    sloppyWeight = 1/(1 + matchLength)), including the single-term
    repeat-group handling (initComplex / advanceRepeatGroups /
    advanceRpts collision resolution, SloppyPhraseMatcher.java:286-470:
    two phrase slots carrying the SAME term may never sit on the same
    token position — on collision the lesser of the two advances).

    Algorithm: each phrase slot is an iterator over offset-adjusted
    positions; a priority queue repeatedly advances the minimum; a match
    is emitted each time the advanced iterator overtakes the queue
    minimum captured at pop time while the running matchLength
    (end - min position, minimized while the leader catches up) is
    <= slop. Javadoc-documented behavior replicated: "a b"~2 on doc
    "x a b a y" matches twice — distance 0 and distance 2 — freq =
    1 + 1/3. Like the reference, not every combination is found
    ("a b c b a" scores "a b c"~4 and "c b a"~4 differently —
    SloppyPhraseMatcher.java:45-50 comment); this IS the reference
    behavior, required for rank identity. ``terms`` (aligned with
    pos_lists) drives repeat-group detection; None = all distinct.
    The queue is a re-sorted list (equivalent to the reference's
    pop/re-add heap repair after collision advances).

    ``slot_terms`` (tuple of per-slot term tuples, MultiPhraseQuery
    shape) enables the multi-term repeat handling (hasMultiTermRpts,
    SloppyPhraseMatcher.java:435-453 init collide-loop + :562-585
    connected-component groups over the bipartite slot/term graph):
    slots that share ANY repeating term join one group; init resolves
    collisions by advancing the lesser instead of the j-steps rule.
    """
    n = len(pos_lists)
    plists = [np.asarray(p, dtype=np.int64) for p in pos_lists]
    pos = [int(plists[i][0]) - i for i in range(n)]
    nxt = [1] * n
    end = max(pos)

    grp_of = [-1] * n
    groups: list[list[int]] = []
    has_multi = False
    if slot_terms is not None:
        # repeatingTerms (SloppyPhraseMatcher.java:595-607): terms
        # carried by >= 2 slots
        cnt: dict = {}
        for slot in slot_terms:
            for t in set(slot):
                cnt[t] = cnt.get(t, 0) + 1
        rpt_terms = {t for t, c in cnt.items() if c >= 2}
        if rpt_terms:
            rpt_slots = [i for i, slot in enumerate(slot_terms) if rpt_terms & set(slot)]
            has_multi = any(len(set(slot_terms[i])) > 1 for i in rpt_slots)
            if not has_multi:
                by_term: dict = {}
                for i in rpt_slots:
                    by_term.setdefault(next(iter(slot_terms[i])), []).append(i)
                for idxs in by_term.values():
                    if len(idxs) > 1:
                        for i in idxs:
                            grp_of[i] = len(groups)
                        groups.append(idxs)
            else:
                # unionTermGroups (:648-663): union repeating-term sets
                # sharing a slot until disjoint, then each repeating
                # slot joins its terms' component
                comps: list[set] = []
                for i in rpt_slots:
                    cur = set(slot_terms[i]) & rpt_terms
                    rest = []
                    for m in comps:
                        if m & cur:
                            cur |= m
                        else:
                            rest.append(m)
                    comps = rest + [cur]
                for m in comps:
                    members = [i for i in rpt_slots if set(slot_terms[i]) & m]
                    if len(members) > 1:
                        for i in members:
                            grp_of[i] = len(groups)
                        groups.append(members)  # ascending offset order
    elif terms is not None:
        by_term = {}
        for i, t in enumerate(terms):
            by_term.setdefault(t, []).append(i)
        for idxs in by_term.values():
            if len(idxs) > 1:
                for i in idxs:
                    grp_of[i] = len(groups)
                groups.append(idxs)  # members in phrase-offset order

    def advance(i: int) -> bool:
        nonlocal end
        if nxt[i] < len(plists[i]):
            pos[i] = int(plists[i][nxt[i]]) - i
            nxt[i] += 1
            if pos[i] > end:
                end = pos[i]
            return True
        return False

    def tp(i: int) -> int:  # actual token position (tpPos)
        return pos[i] + i

    # init repeats (advanceRepeatGroups, SloppyPhraseMatcher.java:435-467)
    if has_multi:
        # multi-term branch: some may not collide — resolve by
        # advancing the lesser until the group is collision-free
        for idxs in groups:
            i = 0
            while i < len(idxs):
                incr = 1
                pp = idxs[i]
                while True:
                    k = next((m for m in idxs if m != pp and tp(m) == tp(pp)), None)
                    if k is None:
                        break
                    pp2 = pp if (pos[pp], pp) < (pos[k], k) else k
                    if not advance(pp2):
                        return np.float32(0.0)
                    if idxs.index(pp2) < i:  # rptInd < i: recheck earlier pp
                        incr = 0
                        break
                i += incr
    else:
        # single-term repeats: group member j starts j positions in, so
        # the group begins collision-free ("simpler" branch)
        for idxs in groups:
            for j in range(1, len(idxs)):
                for _ in range(j):
                    if not advance(idxs[j]):
                        return np.float32(0.0)
    end = max(pos)

    def advance_rpts(i: int) -> bool:
        """Collision resolution after advancing pp i: while another
        member of its repeat group sits on the same token position,
        advance the lesser (by adjusted position, then offset)."""
        p = i
        while grp_of[p] >= 0:
            k = next((m for m in groups[grp_of[p]] if m != p and tp(m) == tp(p)), None)
            if k is None:
                return True
            p = p if (pos[p], p) < (pos[k], k) else k
            if not advance(p):
                return False
        return True

    queue = sorted(range(n), key=lambda i: (pos[i], i))
    positioned = True
    has_rpts = bool(groups)

    def next_match() -> tuple[bool, int]:
        nonlocal positioned, queue
        if not positioned:
            return False, 0
        queue.sort(key=lambda i: (pos[i], i))
        lead = queue.pop(0)
        match_length = end - pos[lead]
        next_top = pos[queue[0]]  # captured once per pop, like the reference
        while advance(lead):
            if has_rpts and not advance_rpts(lead):
                break
            if pos[lead] > next_top:
                queue.append(lead)
                if match_length <= slop:
                    return True, match_length
                queue.sort(key=lambda i: (pos[i], i))
                lead = queue.pop(0)
                next_top = pos[queue[0]]
                match_length = end - pos[lead]
            else:
                ml2 = end - pos[lead]
                if ml2 < match_length:
                    match_length = ml2
        positioned = False
        return match_length <= slop, match_length

    ok, ml = next_match()
    if not ok:
        return np.float32(0.0)
    one = np.float32(1.0)
    freq = one / (one + np.float32(ml))  # float32 accumulation, PhraseScorer.java:75-79
    while True:
        ok, ml = next_match()
        if not ok:
            break
        freq = np.float32(freq + one / (one + np.float32(ml)))
    return freq


def _sloppy_freq2(a_raw, b_raw, slop: int) -> np.float32:
    """Specialized 2-slot (distinct terms) sloppy matcher — exact same
    emissions as ``_lucene_sloppy_freq`` (property-tested equal in
    tests/test_sloppy.py) without the queue machinery: for two
    monotonically increasing iterators, end == max(pos_a, pos_b) at all
    times, so the PQ loop collapses to a two-pointer merge. The lead
    (smaller adjusted position; slot 0 on ties, PhraseQueue order)
    advances through its run; a match is emitted at a STRICT crossing
    (or at exhaustion) with matchLength = the run's closest approach to
    the stationary pointer. ~10x less Python overhead per candidate doc
    on the phrase hot path."""
    A = a_raw.tolist() if hasattr(a_raw, "tolist") else list(a_raw)
    B = [p - 1 for p in (b_raw.tolist() if hasattr(b_raw, "tolist") else b_raw)]
    na, nb = len(A), len(B)
    ia = ib = 0
    pa, pb = A[0], B[0]
    one = np.float32(1.0)
    freq = np.float32(0.0)
    while True:
        if pa <= pb:  # lead = slot 0 (wins ties, PhraseQueue order)
            ml = pb - pa
            crossed = False
            while ia + 1 < na:
                ia += 1
                pa = A[ia]
                if pa > pb:
                    crossed = True
                    break
                if pb - pa < ml:
                    ml = pb - pa
            if ml <= slop:
                freq = np.float32(freq + one / (one + np.float32(ml)))
            if not crossed:
                return freq
        else:  # lead = slot 1
            ml = pa - pb
            crossed = False
            while ib + 1 < nb:
                ib += 1
                pb = B[ib]
                if pb > pa:
                    crossed = True
                    break
                if pa - pb < ml:
                    ml = pa - pb
            if ml <= slop:
                freq = np.float32(freq + one / (one + np.float32(ml)))
            if not crossed:
                return freq


def _sloppy2_flat_freqs(A: np.ndarray, B: np.ndarray, slop: int, n_cand: int) -> np.ndarray:
    """Flat vectorized :func:`_sloppy_freq2` over every candidate at
    once. The alternating run-crossing two-pointer emits exactly one
    match per ADJACENT CROSS-LIST pair in the merged order of
    (A-positions + 1) and B-positions, with A winning ties (the
    PhraseQueue slot-0 tie rule) — so the whole PQ simulation collapses
    to one merge-sort plus a boundary mask. matchLength = the adjacent
    gap; emissions accumulate in merged (ascending) order, preserving
    the reference's float32 add sequence. Fuzz-verified bit-equal to
    _sloppy_freq2 (tests/test_sloppy.py)."""
    freqs = np.zeros(n_cand, dtype=np.float32)
    if not len(A) or not len(B):
        return freqs
    # adjusted A' = A + 1 (phrase offset: slot-1 expected at pos+1)
    m = np.concatenate([((A + 1) << 1), (B << 1) | 1])
    m.sort(kind="stable")
    keys = m >> 1
    tags = (m & 1).astype(np.int8)
    if len(m) < 2:
        return freqs
    ci = keys >> 32
    # tie pairs (same adjusted position, one from each list): the pair
    # joins the CURRENTLY LEADING run — its order is (previous
    # element's tag, other), defaulting to slot 0 at a run start
    # (PhraseQueue pa <= pb tie rule). Resolved sequentially since a
    # tie's outcome feeds the next tie's "previous tag".
    tie_idx = np.nonzero((keys[1:] == keys[:-1]) & (ci[1:] == ci[:-1]))[0]
    for i in tie_idx:
        prev = tags[i - 1] if i > 0 and ci[i - 1] == ci[i] else 0
        if prev == 1 and tags[i] == 0:  # b leads → b's element first
            tags[i], tags[i + 1] = np.int8(1), np.int8(0)
    boundary = (tags[1:] != tags[:-1]) & (ci[1:] == ci[:-1])
    if not boundary.any():
        return freqs
    gaps = (keys[1:] - keys[:-1])[boundary]
    bci = ci[1:][boundary]
    ok = gaps <= slop
    if not ok.any():
        return freqs
    contrib = np.float32(1.0) / (np.float32(1.0) + gaps[ok].astype(np.float32))
    np.add.at(freqs, bci[ok].astype(np.int64), contrib)
    return freqs


def _sloppy_freq_exact(pos_lists: list, slop: int, terms: tuple | None = None) -> np.float32:
    """Dispatch: tight 2-slot kernel for the dominant two-distinct-term
    case, full reference PQ simulation otherwise."""
    if len(pos_lists) == 2 and (terms is None or terms[0] != terms[1]):
        return _sloppy_freq2(pos_lists[0], pos_lists[1], slop)
    return _lucene_sloppy_freq(pos_lists, slop, terms=terms)


# ---- lockstep vectorized n-slot positional kernels ---------------------------
#
# The per-candidate-doc Python loops (_lucene_sloppy_freq /
# minimal_intervals) are exact but Python-bound: a 3-term sloppy phrase
# whose rarest term is still hot runs one interpreter loop per candidate
# doc. The kernels below run the SAME state machines for every candidate
# doc simultaneously — one numpy pass advances one step of every active
# doc — so the cost per step is O(active_docs) vectorized instead of
# O(1) interpreted. Emissions accumulate per-doc in the same order as
# the sequential algorithms (each doc's state advances through the
# identical sequence), so float32 freq accumulation is bit-identical
# (fuzz-verified in tests/test_sloppy.py / test_spannear.py).

_HI64 = np.int64((1 << 62))
_LOW32 = np.int64((1 << 32) - 1)


def _flat_slots(key_arrays: list[np.ndarray], n_cand: int):
    """Split composite (ci<<32|pos) key arrays into per-slot flat
    position arrays plus per-candidate segment bounds. Returns
    (pos_flat[j], seg_start[j], seg_len[j]) triples; positions are RAW
    (not offset-adjusted)."""
    out = []
    for K in key_arrays:
        ci = (K >> np.int64(32)).astype(np.int64)
        pos = (K & _LOW32).astype(np.int64)
        seg_len = np.bincount(ci, minlength=n_cand).astype(np.int64)
        seg_start = np.concatenate([[0], np.cumsum(seg_len)[:-1]]).astype(np.int64)
        out.append((pos, seg_start, seg_len))
    return out


def _init_slot_state(slots, n_cand: int, offsets: bool = False):
    """(pos, ptr, lim, ok_docs) initial lockstep state. Docs missing a
    slot entirely (possible when the caller's candidate set is not a
    full conjunction — NOT-variant filter operands) start inactive with
    sentinel positions instead of reading a neighbor's segment."""
    n = len(slots)
    pos = np.zeros((n_cand, n), dtype=np.int64)
    ptr = np.empty((n_cand, n), dtype=np.int64)
    lim = np.empty((n_cand, n), dtype=np.int64)
    ok = np.ones(n_cand, dtype=bool)
    for j, (P, s, ln) in enumerate(slots):
        ok &= ln > 0
        s_c = np.minimum(s, max(len(P) - 1, 0))
        if len(P):
            pos[:, j] = P[s_c] - (j if offsets else 0)
        ptr[:, j] = s + 1
        lim[:, j] = s + ln
    return pos, ptr, lim, ok


def _keys_collide(key_arrays: list[np.ndarray]) -> bool:
    """True when two slots share a (doc, position) composite key —
    possible only on stacked-token indexes (posInc-0 shingles/ngrams).
    The flat minimal-interval kernels assume distinct positions across
    slots (zero-width windows would need the tree evaluator's clamped
    semantics), so colliding inputs fall back to the per-candidate
    tree path."""
    total = sum(len(k) for k in key_arrays)
    if total == 0:
        return False
    return len(np.unique(np.concatenate(key_arrays))) < total


def _sloppy_flat_freqs_n(key_arrays: list[np.ndarray], slop: int, n_cand: int) -> np.ndarray:
    """Lockstep-vectorized :func:`_lucene_sloppy_freq` for n DISTINCT
    phrase slots over every candidate doc at once (the no-repeats PQ,
    SloppyPhraseMatcher.java:174-206 nextMatch + initSimple). State per
    doc: per-slot cursors into the flat position arrays, offset-adjusted
    positions, running end / matchLength / captured queue-top. Each
    numpy iteration performs exactly one advancePP per active doc.
    Candidate docs are term-conjunction members, so every segment is
    non-empty. Emission order per doc equals the sequential algorithm's,
    preserving the reference float32 accumulation
    (PhraseScorer.java:75-79)."""
    n = len(key_arrays)
    freqs = np.zeros(n_cand, dtype=np.float32)
    if n_cand == 0 or any(not len(K) for K in key_arrays):
        return freqs
    slots = _flat_slots(key_arrays, n_cand)
    offs = np.arange(n, dtype=np.int64)
    pos, ptr, lim, ok_docs = _init_slot_state(slots, n_cand, offsets=True)
    end = pos.max(axis=1)
    rows = np.arange(n_cand)
    order = pos * n + offs  # PhraseQueue order: (position, offset)
    lead = np.argmin(order, axis=1).astype(np.int64)
    tmp = order[rows, lead].copy()
    order[rows, lead] = _HI64
    next_top = order.min(axis=1) // n  # pq.top().position after pop
    order[rows, lead] = tmp
    match_len = end - pos[rows, lead]
    one = np.float32(1.0)
    active = ok_docs
    while True:
        act = np.nonzero(active)[0]
        if not len(act):
            break
        l = lead[act]
        exhausted = ptr[act, l] >= lim[act, l]
        exh = act[exhausted]
        if len(exh):  # positioned=false path: final emission check
            ml = match_len[exh]
            ok = ml <= slop
            e = exh[ok]
            freqs[e] += one / (one + ml[ok].astype(np.float32))
            active[exh] = False
        live = act[~exhausted]
        if not len(live):
            continue
        l = lead[live]
        # advancePP: gather the next flat position of each doc's lead slot
        newpos = np.empty(len(live), dtype=np.int64)
        for j, (P, _s, _ln) in enumerate(slots):
            m = l == j
            if m.any():
                newpos[m] = P[ptr[live[m], j]] - j
        pos[live, l] = newpos
        ptr[live, l] += 1
        end[live] = np.maximum(end[live], newpos)
        crossed = newpos > next_top[live]
        nc = live[~crossed]
        if len(nc):  # keep minimizing the current match length
            ml2 = end[nc] - pos[nc, lead[nc]]
            match_len[nc] = np.minimum(match_len[nc], ml2)
        cr = live[crossed]
        if len(cr):  # done minimizing: emit if within slop, then re-pop
            ml = match_len[cr]
            ok = ml <= slop
            e = cr[ok]
            freqs[e] += one / (one + ml[ok].astype(np.float32))
            order_cr = pos[cr] * n + offs
            lcr = np.argmin(order_cr, axis=1).astype(np.int64)
            lead[cr] = lcr
            rr = np.arange(len(cr))
            order_cr[rr, lcr] = _HI64
            next_top[cr] = order_cr.min(axis=1) // n
            match_len[cr] = end[cr] - pos[cr, lcr]
    return freqs


def _ordered_flat_freqs(
    key_arrays: list[np.ndarray], cap, n_cand: int
) -> np.ndarray:
    """Lockstep-vectorized ordered minimal-interval freqs for n terms
    (:func:`minimal_intervals` in_order=True, the NearSpansOrdered.java:40
    greedy-chain + backward-stretch algorithm) over every candidate doc
    at once. One round = one emitted interval per active doc; every
    forward/backward chain step is a single composite-key searchsorted
    across all docs. freq += 1/(1+gaps) per interval with gaps =
    width - n <= cap (None = unbounded), float32 in start order."""
    n = len(key_arrays)
    freqs = np.zeros(n_cand, dtype=np.float32)
    if n_cand == 0 or any(not len(K) for K in key_arrays):
        return freqs
    K0 = key_arrays[0]
    ci0 = (K0 >> np.int64(32)).astype(np.int64)
    seg_len0 = np.bincount(ci0, minlength=n_cand).astype(np.int64)
    seg_start0 = np.concatenate([[0], np.cumsum(seg_len0)[:-1]]).astype(np.int64)
    one = np.float32(1.0)
    # cur = composite key of the current first-list chain start
    docs_alive = np.nonzero(seg_len0 > 0)[0]
    cur = K0[seg_start0[docs_alive]]
    alive_ci = docs_alive.astype(np.int64)
    while len(cur):
        # forward greedy chain: first element of each later list > prev
        prev = cur
        okm = np.ones(len(cur), dtype=bool)
        for j in range(1, n):
            Kj = key_arrays[j]
            kk = np.searchsorted(Kj, prev, side="right")
            v = kk < len(Kj)
            kc = np.minimum(kk, len(Kj) - 1)
            v &= (Kj[kc] >> 32) == (prev >> 32)
            okm &= v
            prev = np.where(okm, Kj[kc], prev)
        alive_ci, cur, prev = alive_ci[okm], cur[okm], prev[okm]
        if not len(cur):
            break
        # backward stretch-to-minimal: latest chain reaching this end
        c = prev
        for j in range(n - 2, -1, -1):
            Kj = key_arrays[j]
            kk = np.searchsorted(Kj, c, side="left") - 1
            c = Kj[kk]
        # distinct terms occupy distinct positions, so width >= n and
        # gaps >= 0 (callers dispatch here only for distinct-term slots)
        gaps = (prev & _LOW32) - (c & _LOW32) + 1 - n
        ok = gaps <= cap if cap is not None else np.ones(len(gaps), dtype=bool)
        e = alive_ci[ok]
        freqs[e] += one / (one + gaps[ok].astype(np.float32))
        # advance i0 strictly past this chain's start
        kk = np.searchsorted(K0, c, side="right")
        v = kk < len(K0)
        kc = np.minimum(kk, len(K0) - 1)
        v &= (K0[kc] >> 32) == (c >> 32)
        alive_ci, cur = alive_ci[v], K0[kc[v]]
    return freqs


def _ordered_flat_intervals(
    key_arrays: list[np.ndarray], cap, n_cand: int
) -> tuple[np.ndarray, np.ndarray]:
    """Ordered minimal intervals as flat composite-key (start, end)
    arrays, per-doc ascending — the interval-collecting twin of
    :func:`_ordered_flat_freqs` (same chains, same order), for filtered
    combinators that post-process the interval set."""
    if n_cand == 0 or any(not len(K) for K in key_arrays):
        return EMPTY_I, EMPTY_I
    if len(key_arrays) == 2:
        return _two_term_flat_intervals(key_arrays[0], key_arrays[1], True, cap)
    return _ordered_flat_intervals_nary(key_arrays, cap, n_cand)


def _ordered_flat_intervals_nary(
    key_arrays: list[np.ndarray], cap, n_cand: int
) -> tuple[np.ndarray, np.ndarray]:
    """The n-ary lazy-advance machine (kept directly callable for the
    pair-kernel equivalence tests)."""
    n = len(key_arrays)
    S_out: list[np.ndarray] = []
    E_out: list[np.ndarray] = []
    if n_cand == 0 or any(not len(K) for K in key_arrays):
        return EMPTY_I, EMPTY_I
    K0 = key_arrays[0]
    ci0 = (K0 >> np.int64(32)).astype(np.int64)
    seg_len0 = np.bincount(ci0, minlength=n_cand).astype(np.int64)
    seg_start0 = np.concatenate([[0], np.cumsum(seg_len0)[:-1]]).astype(np.int64)
    docs_alive = np.nonzero(seg_len0 > 0)[0]
    cur = K0[seg_start0[docs_alive]]
    while len(cur):
        prev = cur
        okm = np.ones(len(cur), dtype=bool)
        for j in range(1, n):
            Kj = key_arrays[j]
            kk = np.searchsorted(Kj, prev, side="right")
            v = kk < len(Kj)
            kc = np.minimum(kk, len(Kj) - 1)
            v &= (Kj[kc] >> 32) == (prev >> 32)
            okm &= v
            prev = np.where(okm, Kj[kc], prev)
        cur, prev = cur[okm], prev[okm]
        if not len(cur):
            break
        c = prev
        for j in range(n - 2, -1, -1):
            Kj = key_arrays[j]
            c = Kj[np.searchsorted(Kj, c, side="left") - 1]
        gaps = (prev & _LOW32) - (c & _LOW32) + 1 - n
        ok = gaps <= cap if cap is not None else np.ones(len(gaps), dtype=bool)
        S_out.append(c[ok])
        E_out.append(prev[ok])
        kk = np.searchsorted(K0, c, side="right")
        v = kk < len(K0)
        kc = np.minimum(kk, len(K0) - 1)
        v &= (K0[kc] >> 32) == (c >> 32)
        cur = K0[kc[v]]
    if not S_out:
        return EMPTY_I, EMPTY_I
    S = np.concatenate(S_out)
    E = np.concatenate(E_out)
    order = np.argsort(S, kind="stable")  # per-doc ascending (rounds interleave docs)
    return S[order], E[order]


_I64_MAX = np.int64(np.iinfo(np.int64).max)


def _two_term_flat_intervals(
    A: np.ndarray, B: np.ndarray, in_order: bool, cap
) -> tuple[np.ndarray, np.ndarray]:
    """Closed-form minimal intervals for TWO disjoint sorted key
    streams (the dominant pair shape) — no lockstep loop, a handful of
    searchsorted passes. Emits exactly the n-ary machines' set:

    ordered: mutual-nearest crossings (c, b) with c = last A < b and
    b = first B > c (the lazy-advance rounds of
    :func:`_ordered_flat_intervals`).

    unordered: A-started windows [a, firstB>=a] kept iff the next A
    lies beyond the window (else the later start yields a contained
    interval), plus the symmetric B-started windows — the emissions of
    :func:`_unordered_flat_intervals`'s sliding window. Streams are
    collision-checked upstream (A ∩ B = ∅), so >= and > coincide."""
    if not len(A) or not len(B):
        return EMPTY_I, EMPTY_I
    if in_order:
        i = np.searchsorted(A, B) - 1  # last A < b (disjoint: < == <=)
        vb = i >= 0
        c = A[np.maximum(i, 0)]
        vb &= (c >> 32) == (B >> 32)
        # b must be the FIRST B after c — later Bs over the same c
        # would properly contain the first crossing
        vb &= np.searchsorted(B, c, side="right") == np.arange(len(B))
        S, E = c[vb], B[vb]
        # starts strictly increase with b: already per-doc ascending
    else:
        ja = np.searchsorted(B, A)  # first B >= a
        va = ja < len(B)
        hiA = B[np.minimum(ja, len(B) - 1)]
        va &= (hiA >> 32) == (A >> 32)
        nxtA = np.empty(len(A), dtype=np.int64)
        nxtA[:-1] = A[1:]
        nxtA[-1] = _I64_MAX
        va &= nxtA > hiA
        jb = np.searchsorted(A, B)  # first A >= b
        vb = jb < len(A)
        hiB = A[np.minimum(jb, len(A) - 1)]
        vb &= (hiB >> 32) == (B >> 32)
        nxtB = np.empty(len(B), dtype=np.int64)
        nxtB[:-1] = B[1:]
        nxtB[-1] = _I64_MAX
        vb &= nxtB > hiB
        S = np.concatenate([A[va], B[vb]])
        E = np.concatenate([hiA[va], hiB[vb]])
        order = np.argsort(S, kind="stable")
        S, E = S[order], E[order]
    if cap is not None and len(S):
        keep = (E & _LOW32) - (S & _LOW32) - 1 <= cap  # gaps = width - 2
        S, E = S[keep], E[keep]
    return S, E


def _unordered_flat_intervals(
    key_arrays: list[np.ndarray], cap, n_cand: int
) -> tuple[np.ndarray, np.ndarray]:
    """Unordered minimal intervals as flat composite-key (start, end)
    arrays, per-doc ascending — the collecting twin of
    :func:`_unordered_flat_freqs`. Two streams dispatch to the
    closed-form pair kernel; n >= 3 runs the lockstep machine
    (:func:`_unordered_flat_intervals_nary`)."""
    if n_cand == 0 or any(not len(K) for K in key_arrays):
        return EMPTY_I, EMPTY_I
    if len(key_arrays) == 2:
        return _two_term_flat_intervals(key_arrays[0], key_arrays[1], False, cap)
    return _unordered_flat_intervals_nary(key_arrays, cap, n_cand)


def _unordered_flat_intervals_nary(
    key_arrays: list[np.ndarray], cap, n_cand: int
) -> tuple[np.ndarray, np.ndarray]:
    """The n-ary sliding-window machine (kept directly callable — the
    pair-kernel equivalence tests run it at n == 2 against the closed
    form)."""
    n = len(key_arrays)
    if n_cand == 0 or any(not len(K) for K in key_arrays):
        return EMPTY_I, EMPTY_I
    slots = _flat_slots(key_arrays, n_cand)
    pos, ptr, lim, ok_docs = _init_slot_state(slots, n_cand)
    hi = pos.max(axis=1)
    active = ok_docs
    S_out: list[np.ndarray] = []
    E_out: list[np.ndarray] = []
    while True:
        act = np.nonzero(active)[0]
        if not len(act):
            break
        lo_slot = np.argmin(pos[act], axis=1).astype(np.int64)
        lo = pos[act, lo_slot]
        window_hi = hi[act]
        exhausted = ptr[act, lo_slot] >= lim[act, lo_slot]
        newpos = np.empty(len(act), dtype=np.int64)
        for j, (P, _s, _ln) in enumerate(slots):
            m = (lo_slot == j) & ~exhausted
            if m.any():
                newpos[m] = P[ptr[act[m], j]]
        grow = ~exhausted & (newpos > window_hi)
        emit = exhausted | grow
        em = np.nonzero(emit)[0]
        if len(em):
            gaps = window_hi[em] - lo[em] + 1 - n
            ok = gaps <= cap if cap is not None else np.ones(len(gaps), dtype=bool)
            ci = act[em[ok]].astype(np.int64)
            S_out.append((ci << np.int64(32)) | lo[em][ok])
            E_out.append((ci << np.int64(32)) | window_hi[em][ok])
        lv = np.nonzero(~exhausted)[0]
        pos[act[lv], lo_slot[lv]] = newpos[lv]
        ptr[act[lv], lo_slot[lv]] += 1
        g = np.nonzero(grow)[0]
        hi[act[g]] = newpos[g]
        active[act[exhausted]] = False
    if not S_out:
        return EMPTY_I, EMPTY_I
    S = np.concatenate(S_out)
    E = np.concatenate(E_out)
    order = np.argsort(S, kind="stable")
    return S[order], E[order]


def _unordered_flat_freqs(
    key_arrays: list[np.ndarray], cap, n_cand: int
) -> np.ndarray:
    """Lockstep-vectorized unordered minimal-interval freqs
    (:func:`minimal_intervals` in_order=False: sliding window over the
    merged streams, emitting when advancing the minimum grows the right
    edge or exhausts its list). One numpy iteration = one window advance
    per active doc."""
    n = len(key_arrays)
    freqs = np.zeros(n_cand, dtype=np.float32)
    if n_cand == 0 or any(not len(K) for K in key_arrays):
        return freqs
    slots = _flat_slots(key_arrays, n_cand)
    pos, ptr, lim, ok_docs = _init_slot_state(slots, n_cand)
    hi = pos.max(axis=1)
    one = np.float32(1.0)
    active = ok_docs
    while True:
        act = np.nonzero(active)[0]
        if not len(act):
            break
        lo_slot = np.argmin(pos[act], axis=1).astype(np.int64)  # ties → lowest slot
        lo = pos[act, lo_slot]
        window_hi = hi[act]
        exhausted = ptr[act, lo_slot] >= lim[act, lo_slot]
        # emission set: exhausted docs always emit; live docs emit when
        # the advanced value grows the right edge
        newpos = np.empty(len(act), dtype=np.int64)
        for j, (P, _s, _ln) in enumerate(slots):
            m = (lo_slot == j) & ~exhausted
            if m.any():
                newpos[m] = P[ptr[act[m], j]]
        grow = ~exhausted & (newpos > window_hi)
        emit = exhausted | grow
        em = np.nonzero(emit)[0]
        if len(em):
            gaps = window_hi[em] - lo[em] + 1 - n
            ok = gaps <= cap if cap is not None else np.ones(len(gaps), dtype=bool)
            e = act[em[ok]]
            freqs[e] += one / (one + gaps[ok].astype(np.float32))
        live = ~exhausted
        lv = np.nonzero(live)[0]
        pos[act[lv], lo_slot[lv]] = newpos[lv]
        ptr[act[lv], lo_slot[lv]] += 1
        g = np.nonzero(grow)[0]
        hi[act[g]] = newpos[g]
        active[act[exhausted]] = False
    return freqs


def _evaluate_bool(spec: BoolSpec, ctx: ChunkContext) -> tuple[np.ndarray, np.ndarray]:
    musts = [evaluate(s, ctx) for s in spec.musts]
    filters = [evaluate(s, ctx)[0] for s in spec.filters]
    shoulds = [evaluate(s, ctx) for s in spec.shoulds]
    nots = [evaluate(s, ctx)[0] for s in spec.nots]

    if musts or filters:
        cand: np.ndarray | None = None
        for d, _ in musts:
            cand = d if cand is None else np.intersect1d(cand, d, assume_unique=True)
        for d in filters:
            cand = d if cand is None else np.intersect1d(cand, d, assume_unique=True)
    else:
        msm = max(spec.msm, 1)
        alldocs = np.concatenate([d for d, _ in shoulds]) if shoulds else EMPTY_I
        uniq, counts = np.unique(alldocs, return_counts=True)
        cand = uniq[counts >= msm]
    if spec.msm > 0 and (musts or filters) and shoulds:
        alldocs = np.concatenate([d for d, _ in shoulds])
        uniq, counts = np.unique(alldocs, return_counts=True)
        ok = uniq[counts >= spec.msm]
        cand = np.intersect1d(cand, ok, assume_unique=True)
    for d in nots:
        if len(d) and len(cand):
            cand = cand[~np.isin(cand, d, assume_unique=False)]
    if not len(cand):
        return EMPTY_I, EMPTY_F
    acc = np.zeros(len(cand), dtype=np.float64)  # double accumulation
    for d, sc in musts + shoulds:
        mask, idx = _membership(d, cand)
        acc[mask] += sc[idx[mask]].astype(np.float64)
    return cand, acc.astype(np.float32)


def top_k_from_arrays(docs: np.ndarray, scores: np.ndarray, k: int) -> list[tuple[int, float]]:
    """Top-k with Lucene tie-break: score desc, doc_id asc
    (HitQueue.java:78-84; TopDocs.merge TopDocs.java:202-215)."""
    n = len(docs)
    if n == 0:
        return []
    if n > k:
        # exact: sort all candidates whose score >= kth partition score
        kth = scores[np.argpartition(-scores, k - 1)[k - 1]]
        cand_idx = np.nonzero(scores >= kth)[0]
    else:
        cand_idx = np.arange(n)
    order = np.lexsort((docs[cand_idx], -scores[cand_idx].astype(np.float64)))
    top = cand_idx[order[:k]]
    return [(int(docs[i]), float(scores[i])) for i in top]
