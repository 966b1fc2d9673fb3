"""Sequence packing (concat-and-split pretraining layout): brute-force
python oracle + partition-count invariance (the two-phase distributed
cumsum must be independent of the physical split)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_spark.pipeline.chunking import pack_sequences

SEQ = 512


@pytest.fixture(scope="module")
def counted(spark, corpus_df):
    return corpus_df.select(
        F.row_number()
        .over(__import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy("repo", "path", "commit"))
        .cast("long")
        .alias("doc_id"),
        F.length("content").cast("long").alias("n"),
    ).withColumn("n", F.when(F.col("doc_id") % 17 == 0, F.lit(0)).otherwise(F.col("n")))


def _brute(pdf: pd.DataFrame, seq_len: int) -> pd.DataFrame:
    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    rows, acc = [], 0
    for _, r in pdf.iterrows():
        n = int(r["n"])
        first = acc // seq_len if n > 0 else None
        last = (acc + n - 1) // seq_len if n > 0 else None
        rows.append((int(r["doc_id"]), n, acc, first, last, 0 if n == 0 else last - first + 1))
        acc += n
    return pd.DataFrame(
        rows, columns=["doc_id", "n_tokens", "begin_off", "first_seq", "last_seq", "n_seqs"]
    )


class TestPackSequences:
    def test_matches_brute(self, spark, counted):
        got = (
            pack_sequences(counted, "n", seq_len=SEQ)
            .orderBy("doc_id")
            .toPandas()
        )
        want = _brute(counted.toPandas(), SEQ)
        for c in ("doc_id", "n_tokens", "begin_off", "n_seqs"):
            assert got[c].tolist() == want[c].tolist(), c
        for c in ("first_seq", "last_seq"):
            assert [None if pd.isna(x) else int(x) for x in got[c]] == [
                None if pd.isna(x) else int(x) for x in want[c]
            ], c

    def test_partition_invariance(self, spark, counted):
        a = pack_sequences(counted, "n", seq_len=SEQ, num_partitions=1).orderBy("doc_id").collect()
        b = pack_sequences(counted, "n", seq_len=SEQ, num_partitions=7).orderBy("doc_id").collect()
        c = pack_sequences(counted, "n", seq_len=SEQ, num_partitions=64).orderBy("doc_id").collect()
        assert a == b == c

    def test_total_stream_length(self, spark, counted):
        out = pack_sequences(counted, "n", seq_len=SEQ)
        last = out.orderBy(F.desc("doc_id")).limit(1).collect()[0]
        total = counted.agg(F.sum("n")).collect()[0][0]
        assert last["begin_off"] + last["n_tokens"] == total

    def test_exact_boundary(self, spark):
        # doc ending exactly on a sequence boundary must NOT spill into
        # the next sequence: last_seq = floor((begin+n-1)/L)
        df = spark.createDataFrame(
            [(1, SEQ), (2, SEQ), (3, 1)], "doc_id long, n long"
        )
        rows = {r["doc_id"]: r for r in pack_sequences(df, "n", seq_len=SEQ).collect()}
        assert (rows[1]["first_seq"], rows[1]["last_seq"]) == (0, 0)
        assert (rows[2]["first_seq"], rows[2]["last_seq"]) == (1, 1)
        assert (rows[3]["first_seq"], rows[3]["last_seq"]) == (2, 2)

    def test_bad_seq_len(self, spark, counted):
        with pytest.raises(ValueError):
            pack_sequences(counted, "n", seq_len=0)
