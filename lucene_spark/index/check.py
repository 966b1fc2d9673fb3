"""CheckIndex — full-index validation (CORE/index/CheckIndex.java:90,
529,999,2389 role): every posting blob is re-read and decoded on the
executors, and all cross-table invariants are re-derived relationally.

Checks (all distributed; the per-blob decode runs inside mapInPandas —
one Python iteration per posting *list*, never per doc):

1. postings decode: doc ids strictly increasing; chunk df == #docs;
   every tf >= 1; chunk ttf == sum(tf); positions blob (if present)
   aligns with tfs (len == df, each count == tf); block_last matches
   the decoded block boundaries' last doc ids.
2. term stats: global df/ttf in term_stats == sums over chunk rows.
3. norms: one row per doc; norm byte == intToByte4(dl) recomputed.
4. collection stats: doc_count == #norm rows, sum_ttf == sum(dl).
5. docs table: doc_id unique; content_sha256 present.

Returns a report dict; raises CheckIndexError if any check fails.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


class CheckIndexError(AssertionError):
    pass


def _decode_checker(it):
    from lucene_spark.codec.forutil import unpack_postings
    from lucene_spark.codec.positions import unpack_positions

    for pdf in it:
        bad_order = bad_df = bad_tf = bad_ttf = bad_pos = bad_blocks = 0
        n = 0
        for r in pdf.itertuples():
            n += 1
            d, t, _nm = unpack_postings(bytes(r.blob))
            if len(d) >= 2 and not (np.diff(d) > 0).all():
                bad_order += 1
            if len(d) != r.df:
                bad_df += 1
            if len(t) and not (t >= 1).all():
                bad_tf += 1
            if int(t.sum()) != r.ttf:
                bad_ttf += 1
            if r.block_last is not None and len(r.block_last):
                # block boundaries must be actual doc ids in ascending order
                bl = np.asarray(r.block_last, dtype=np.int64)
                if not np.isin(bl, d).all() or (len(bl) >= 2 and not (np.diff(bl) > 0).all()):
                    bad_blocks += 1
            if r.pos_blob is not None:
                try:
                    pos = unpack_positions(bytes(r.pos_blob), t)
                    if len(pos) != len(d) or any(len(p) != tf for p, tf in zip(pos, t)):
                        bad_pos += 1
                except Exception:  # noqa: BLE001 — corrupt blob IS the finding
                    bad_pos += 1
        yield pd.DataFrame(
            {
                "n": [n],
                "bad_order": [bad_order],
                "bad_df": [bad_df],
                "bad_tf": [bad_tf],
                "bad_ttf": [bad_ttf],
                "bad_pos": [bad_pos],
                "bad_blocks": [bad_blocks],
            }
        )


def check_index(index, raise_on_failure: bool = True) -> dict:
    """Validate an index end-to-end. ``index`` is a SearchIndex."""
    report: dict = {}

    # 1. posting blobs (distributed decode)
    dec = (
        index.postings.select("df", "ttf", "blob", "pos_blob", "block_last")
        .mapInPandas(
            _decode_checker,
            schema="n long, bad_order long, bad_df long, bad_tf long, bad_ttf long, bad_pos long, bad_blocks long",
        )
        .groupBy()
        .sum()
        .first()
    )
    report["posting_lists"] = int(dec["sum(n)"])
    for c in ("bad_order", "bad_df", "bad_tf", "bad_ttf", "bad_pos", "bad_blocks"):
        report[c] = int(dec[f"sum({c})"])

    # 2. term_stats vs chunk sums — both aggregated per term (a tiered
    # index keeps one term_stats row AND separate chunk rows per tier;
    # the per-segment dictionaries must sum to the postings truth)
    chunk_sums = index.postings.groupBy("term").agg(
        F.sum("df").alias("df_sum"), F.sum("ttf").alias("ttf_sum")
    )
    dict_sums = index.term_stats_df.groupBy("term").agg(
        F.sum("df").alias("df"), F.sum("ttf").alias("ttf")
    )
    report["term_stats_mismatches"] = (
        dict_sums.join(chunk_sums, "term", "full")
        .filter(
            (F.col("df") != F.col("df_sum"))
            | (F.col("ttf") != F.col("ttf_sum"))
            | F.col("df").isNull()
            | F.col("df_sum").isNull()
        )
        .count()
    )

    # 3. norms: norm byte must equal intToByte4(dl)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _int_to_byte4(dl: pd.Series) -> pd.Series:
        from lucene_spark.codec.smallfloat import int_to_byte4_np

        return pd.Series(int_to_byte4_np(dl.to_numpy(dtype=np.int64)).astype(np.int64))

    report["norm_mismatches"] = (
        index.norms.filter(F.col("norm") != _int_to_byte4(F.col("dl"))).count()
    )
    report["duplicate_norm_docs"] = (
        index.norms.groupBy("doc_id").count().filter(F.col("count") > 1).count()
    )

    # 4. collection stats. Stacked-token stages (shingles / common
    # grams / ngrams) split the statistics by design: norms hold the
    # DISCOUNTED dl (posInc-0 tokens excluded) while sum_ttf counts
    # every posting — so the sum_ttf cross-check must come from the
    # term dictionary, not Σ dl, on such indexes.
    agg = index.norms.agg(F.count("*").alias("n"), F.sum("dl").alias("s")).first()
    s = index.stats
    report["doc_count_ok"] = int(agg["n"]) == s.doc_count
    m = index.manifest
    # every stacked stage splits the stats — same set _stacker_of covers
    stacked = bool(
        m.get("shingles")
        or m.get("common_grams")
        or m.get("ngrams")
        or m.get("edge_ngrams")
        or m.get("stem_repeat")
        or m.get("synonyms")
    )
    if stacked:
        from lucene_spark.index.builder import FIELD_SEP

        tsum = (
            index.term_stats_df.filter(~F.col("term").contains(FIELD_SEP))
            .agg(F.sum("ttf"))
            .first()[0]
        )
        report["sum_ttf_ok"] = int(tsum or 0) == s.sum_total_term_freq
    else:
        report["sum_ttf_ok"] = int(agg["s"] or 0) == s.sum_total_term_freq

    # 5. docs table
    report["duplicate_doc_ids"] = (
        index.docs.groupBy("doc_id").count().filter(F.col("count") > 1).count()
    )
    report["missing_sha"] = index.docs.filter(F.col("content_sha256").isNull()).count()

    failures = [
        k
        for k in (
            "bad_order",
            "bad_df",
            "bad_tf",
            "bad_ttf",
            "bad_pos",
            "bad_blocks",
            "term_stats_mismatches",
            "norm_mismatches",
            "duplicate_norm_docs",
            "duplicate_doc_ids",
            "missing_sha",
        )
        if report[k]
    ] + [k for k in ("doc_count_ok", "sum_ttf_ok") if not report[k]]
    report["status"] = "ok" if not failures else f"FAILED: {failures}"
    if failures and raise_on_failure:
        raise CheckIndexError(report["status"] + f" report={report}")
    return report
