"""CombinedFieldQuery — BM25F scoring across fields as one pseudo-field.

Re-expression of lucene/sandbox/src/java/org/apache/lucene/sandbox/
search/CombinedFieldQuery.java (:96 class contract, :318-370 pseudo
term/collection statistics, :440-456 weighted freq sum) and
MultiNormsLeafSimScorer.java (:125-154 combined norm):

* pseudo TERM stats over the (field, term) set: docFreq = max of the
  per-field docFreqs, totalTermFreq = Σ weight_f · ttf_f;
* pseudo COLLECTION stats: docCount = max of per-field docCounts,
  sumTotalTermFreq = Σ weight_f · sumTotalTermFreq_f;
* per-doc freq = Σ over all matching (field, term) postings of
  weight_f · tf (a float — the weighted DISI wrapper's freq());
* per-doc norm = intToByte4(round(Σ weight_f ·
  LENGTH_TABLE[norm_byte_f])) over the fields the doc has tokens of
  (the additive-norm contract that makes BM25 compatible);
* score = the ordinary BM25 float32 shapes over (pseudo idf, freq,
  combined norm byte).

Engine disposition: a driver-mode auxiliary scorer like joins/suggest —
postings come from the cached point-read (one pushed-down job for all
field-terms), per-field DENSE norms come from the norms table's
``norm_<field>`` columns (written at build; the reader.getNormValues
per-field store), fetched by a doc-id semi-join bounded by the match
set.  At cluster scale the same plan runs as a DataFrame join keyed on
doc_id; the driver variant is the interactive top-k path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from lucene_spark.codec.smallfloat import NORM_LENGTH_TABLE, int_to_byte4_np
from lucene_spark.index.builder import FIELD_SEP
from lucene_spark.search.similarity import BM25Stats, idf, score_freqs


def combined_field_search(searcher, terms, fields: dict[str, float], k: int = 10, boost: float = 1.0):
    """Top-k (doc_id, score) list for ``terms`` scored across
    ``fields`` ({field: weight}) as one pseudo-field.  ``terms`` are
    analyzed terms (a string is treated as one term).  Fields must all
    be tokenized (the primary field or IndexConfig.extra_fields).
    Returns a list of (doc_id, score) with the HitQueue tie-break."""
    if isinstance(terms, str):
        terms = [terms]
    if not fields:
        raise ValueError("CombinedFieldQuery requires at least one field")
    index = searcher.index
    primary = index.primary_field
    for f in fields:
        if f != primary and f not in index.text_fields:
            raise ValueError(f"field {f!r} is not a tokenized field of this index")

    def key(f: str, t: str) -> str:
        return t if f == primary else f + FIELD_SEP + t

    keys = {(f, t): key(f, t) for f in fields for t in terms}
    plists = index.collect_postings(sorted(set(keys.values())))

    # pseudo term statistics (CombinedFieldQuery.java:328-345)
    doc_freq = 0
    total_ttf = 0.0
    for (f, _t), kk in keys.items():
        pl = plists.get(kk)
        if pl is not None and len(pl.docs):
            doc_freq = max(doc_freq, len(pl.docs))
            total_ttf += float(fields[f]) * float(pl.tfs.sum())
    if doc_freq == 0:
        return []
    # pseudo collection statistics (:357-370)
    doc_count = 0
    sum_ttf = 0.0
    for f in fields:
        st = index.stats_for(f)
        doc_count = max(doc_count, st.doc_count)
        sum_ttf += float(fields[f]) * float(st.sum_total_term_freq)
    pseudo = BM25Stats(doc_count=doc_count, sum_total_term_freq=int(sum_ttf))
    weight = np.float32(np.float32(boost) * idf(int(doc_freq), doc_count))

    # per-doc weighted freq over every matching (field, term) iterator
    freq_of: dict[int, float] = {}
    for (f, _t), kk in keys.items():
        pl = plists.get(kk)
        if pl is None or not len(pl.docs):
            continue
        w = float(fields[f])
        for d, tf in zip(pl.docs.tolist(), pl.tfs.tolist()):
            freq_of[d] = freq_of.get(d, 0.0) + w * tf
    docs = np.array(sorted(freq_of), dtype=np.int64)
    freqs = np.array([freq_of[int(d)] for d in docs], dtype=np.float32)

    # combined norms: dense per-field norm bytes for the matched docs
    cols = [F.col("norm").alias(f"__{primary}") if f == primary else F.col(f"norm_{f}").alias(f"__{f}") for f in fields]
    ids = index.spark.createDataFrame([(int(d),) for d in docs], "doc_id bigint")
    rows = (
        index.norms.join(F.broadcast(ids), "doc_id")
        .select("doc_id", *cols)
        .collect()
    )
    by_doc = {r["doc_id"]: r for r in rows}
    norm_value = np.zeros(len(docs), dtype=np.float64)
    for i, d in enumerate(docs.tolist()):
        r = by_doc[d]
        v = np.float32(0.0)
        for f in fields:
            nb = r[f"__{f}"]
            if nb is not None:
                v = np.float32(v + np.float32(fields[f]) * np.float32(NORM_LENGTH_TABLE[int(nb) & 0xFF]))
        norm_value[i] = float(v)
    # Math.round = floor(x + 0.5) (half-UP), not np.rint's half-to-even
    # (MultiNormsLeafSimScorer combined-norm contract — a weighted
    # length sum of exactly *.5 must round up like the reference)
    nb = int_to_byte4_np(np.floor(norm_value + 0.5).astype(np.int64))

    scores = score_freqs(weight, freqs, nb.astype(np.int64), pseudo.cache())
    order = sorted(range(len(docs)), key=lambda i: (-scores[i], docs[i]))[:k]
    return [(int(docs[i]), float(scores[i])) for i in order]
