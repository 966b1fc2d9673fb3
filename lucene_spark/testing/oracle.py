"""Brute-force BM25 oracle — exhaustive, no pruning, pure Python/numpy.

The role of Lucene's CheckHits (lucene/test-framework/src/java/org/
apache/lucene/tests/search/CheckHits.java): an independent,
obviously-correct scorer that the real engine's (pruned, distributed)
results must equal EXACTLY — same docIDs, same float32 scores, same
(score desc, doc_id asc) tie-break (HitQueue.java:78-84).

Scoring semantics replicated (see lucene_spark.search.similarity for
the float32 shapes):
- boolean score = double-accumulated sum of matching scoring clauses,
  cast to float32 (DisjunctionSumScorer/ConjunctionScorer do the same)
- boost folds into weight creation (weight = boost * idf, float32)
- MultiTermQuery family → constant score (boost) per CONSTANT_SCORE
  rewrite (MultiTermQuery.java:55-93)
- DisjunctionMax = max + tie * (sum - max), double accum, cast float32
- SynonymQuery scored as a pseudo-term with df = max(df_i), tf summed
  per doc (SynonymQuery.java:196-212)
- PhraseQuery: weight = boost * (sum of term idfs, double accum →
  float32) and freq = number of exact phrase occurrences
"""

from __future__ import annotations

import re
from collections import defaultdict

import numpy as np

from lucene_spark.analysis import tokenize_with_positions
from lucene_spark.codec.smallfloat import int_to_byte4
from lucene_spark.search import ast as A
from lucene_spark.search.similarity import BM25Stats, idf, score_freqs


# from-definition copies, deliberately INDEPENDENT of the product
# package (search.textmatch): an oracle that imports the engine's own
# primitives would corrupt both sides of a comparison identically


def levenshtein(a: str, b: str, k: int) -> int:
    """Unbanded textbook edit distance, clamped to k+1 past the budget
    (the product's banded variant has the same observable contract)."""
    D = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        nd = [i]
        for j, cb in enumerate(b, 1):
            nd.append(min(D[j] + 1, nd[j - 1] + 1, D[j - 1] + (ca != cb)))
        D = nd
    return D[-1] if D[-1] <= k else k + 1


def wildcard_to_regex(pattern: str) -> str:
    """'*' -> '.*', '?' -> '.', everything else literal."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "".join(out)


class OracleIndex:
    """In-memory inverted index + exhaustive scorer over token lists."""

    def __init__(self, doc_tokens: dict[int, list[str]], doc_positions: dict[int, list[int]] | None = None):
        self.postings: dict[str, dict[int, int]] = defaultdict(dict)
        self.positions: dict[str, dict[int, list[int]]] = defaultdict(dict)
        self.dl: dict[int, int] = {}
        self.norm: dict[int, int] = {}
        for doc, toks in doc_tokens.items():
            poss = doc_positions[doc] if doc_positions else list(range(len(toks)))
            self.dl[doc] = len(toks)
            self.norm[doc] = int_to_byte4(len(toks))
            for t, p in zip(toks, poss):
                self.postings[t][doc] = self.postings[t].get(doc, 0) + 1
                self.positions[t].setdefault(doc, []).append(p)
        self.stats = BM25Stats(doc_count=len(doc_tokens), sum_total_term_freq=sum(self.dl.values()))
        self.cache = self.stats.cache()
        self.all_docs = sorted(doc_tokens)

    @classmethod
    def from_texts(cls, texts: dict[int, str]) -> "OracleIndex":
        toks, poss = {}, {}
        for doc, text in texts.items():
            t, p = tokenize_with_positions(text)
            toks[doc], poss[doc] = t, p
        return cls(toks, poss)

    # ---- scoring ---------------------------------------------------------

    def _bm25(self, weight: np.float32, doc_tf: dict[int, int]) -> dict[int, np.float32]:
        if not doc_tf:
            return {}
        docs = np.array(sorted(doc_tf), dtype=np.int64)
        tfs = np.array([doc_tf[d] for d in docs], dtype=np.float32)
        norms = np.array([self.norm[int(d)] for d in docs], dtype=np.int64)
        scores = score_freqs(weight, tfs, norms, self.cache)
        return {int(d): s for d, s in zip(docs, scores)}

    def _expand(self, q: A.Query) -> list[str]:
        terms = sorted(self.postings)
        if isinstance(q, A.PrefixQuery):
            return [t for t in terms if t.startswith(q.prefix)]
        if isinstance(q, A.WildcardQuery):
            rx = re.compile(wildcard_to_regex(q.pattern))
            return [t for t in terms if rx.fullmatch(t)]
        if isinstance(q, A.RegexpQuery):
            rx = re.compile(q.pattern)
            return [t for t in terms if rx.fullmatch(t)]
        if isinstance(q, A.FuzzyQuery):
            pl = q.prefix_length
            return [
                t
                for t in terms
                if t.startswith(q.term[:pl]) and levenshtein(q.term, t, q.max_edits) <= q.max_edits
            ]
        if isinstance(q, A.TermInSetQuery):
            return [t for t in q.terms if t in self.postings]
        raise TypeError(q)

    def _phrase_freqs(self, terms: tuple[str, ...]) -> dict[int, int]:
        """Exact phrase occurrence counts (ExactPhraseMatcher semantics)."""
        cand: set[int] | None = None
        for t in terms:
            docs = set(self.positions.get(t, {}))
            cand = docs if cand is None else cand & docs
        out: dict[int, int] = {}
        for doc in cand or ():
            first = self.positions[terms[0]][doc]
            n = 0
            for p in first:
                if all((p + i) in self.positions[terms[i]].get(doc, []) for i in range(1, len(terms))):
                    n += 1
            if n:
                out[doc] = n
        return out

    def score(self, q: A.Query, boost: float = 1.0) -> dict[int, np.float32]:
        """Exhaustive: doc -> float32 score for every matching doc."""
        boost = np.float32(boost)
        if isinstance(q, A.MatchNoDocsQuery):
            return {}
        if isinstance(q, A.MatchAllDocsQuery):
            return {d: np.float32(boost) for d in self.all_docs}
        if isinstance(q, A.BoostQuery):
            return self.score(q.query, np.float32(boost * np.float32(q.boost)))
        if isinstance(q, A.ConstantScoreQuery):
            matches = self.score(q.query, np.float32(1.0))
            return {d: np.float32(boost) for d in matches}
        if isinstance(q, A.TermQuery):
            df = len(self.postings.get(q.term, {}))
            if df == 0:
                return {}
            weight = self.stats.term_weight(df, boost)
            return self._bm25(weight, self.postings[q.term])
        if isinstance(q, A.SynonymQuery):
            doc_tf: dict[int, int] = defaultdict(int)
            dfs = []
            for t in q.terms:
                p = self.postings.get(t, {})
                if not p:
                    continue
                dfs.append(len(p))
                for d, tf in p.items():
                    doc_tf[d] += tf
            if not dfs:
                return {}
            weight = np.float32(boost * idf(max(dfs), self.stats.doc_count))
            return self._bm25(weight, dict(doc_tf))
        if isinstance(q, A.PhraseQuery):
            if q.slop:
                raise NotImplementedError("sloppy phrases (slop > 0) are a later milestone")
            freqs = self._phrase_freqs(q.terms)
            if not freqs:
                return {}
            total = float(np.sum([float(idf(len(self.postings.get(t, {})), self.stats.doc_count)) for t in q.terms]))
            weight = np.float32(boost * np.float32(total))
            return self._bm25(weight, freqs)
        if isinstance(q, (A.PrefixQuery, A.WildcardQuery, A.RegexpQuery, A.FuzzyQuery, A.TermInSetQuery)):
            docs: set[int] = set()
            for t in self._expand(q):
                docs.update(self.postings[t])
            return {d: np.float32(boost) for d in docs}
        if isinstance(q, A.DisjunctionMaxQuery):
            subs = [self.score(s, boost) for s in q.queries]
            docs = set().union(*subs) if subs else set()
            out = {}
            for d in docs:
                vals = [float(s[d]) for s in subs if d in s]
                mx, sm = max(vals), sum(vals)
                out[d] = np.float32(mx + (sm - mx) * q.tie_breaker)
            return out
        if isinstance(q, A.BooleanQuery):
            return self._score_boolean(q, boost)
        raise TypeError(f"oracle cannot score {type(q)}")

    def _score_boolean(self, q: A.BooleanQuery, boost: np.float32) -> dict[int, np.float32]:
        musts = [self.score(s, boost) for o, s in q.clauses if o is A.Occur.MUST]
        filters = [set(self.score(s, np.float32(1.0))) for o, s in q.clauses if o is A.Occur.FILTER]
        shoulds = [self.score(s, boost) for o, s in q.clauses if o is A.Occur.SHOULD]
        nots = [set(self.score(s, np.float32(1.0))) for o, s in q.clauses if o is A.Occur.MUST_NOT]

        if musts or filters:
            cand = None
            for m in musts:
                cand = set(m) if cand is None else cand & set(m)
            for f in filters:
                cand = f if cand is None else cand & f
        else:
            msm = max(q.minimum_should_match, 1)
            counts: dict[int, int] = defaultdict(int)
            for s in shoulds:
                for d in s:
                    counts[d] += 1
            cand = {d for d, c in counts.items() if c >= msm}
        if q.minimum_should_match > 0 and (musts or filters):
            counts = defaultdict(int)
            for s in shoulds:
                for d in s:
                    counts[d] += 1
            cand = {d for d in cand if counts[d] >= q.minimum_should_match}
        for n in nots:
            cand -= n
        out: dict[int, np.float32] = {}
        for d in cand:
            acc = 0.0  # double accumulation, float32 cast at the end
            for m in musts:
                acc += float(m[d])
            for s in shoulds:
                if d in s:
                    acc += float(s[d])
            out[d] = np.float32(acc)
        return out

    def top_k(self, q: A.Query, k: int) -> list[tuple[int, float]]:
        """Exhaustive top-k with Lucene tie-break (score desc, doc asc)."""
        q = A.rewrite(q)
        scored = self.score(q)
        ranked = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [(d, float(s)) for d, s in ranked]
