"""Streaming weighted reservoir (streaming/reservoir.py):

- final reservoir == the BATCH Efraimidis-Spirakis sampler over the
  same rows, bit-for-bit (same es_key expression) — and independent
  of how the stream is chopped into trigger batches;
- per-stratum reservoirs: exact k per stratum, same equality;
- state is bounded at k rows (reservoir never exceeds k).
"""

import shutil

from pyspark.sql import functions as F

from prefix_filter_spark.operators.sampling import (
    weighted_sample_per_stratum,
    weighted_sample_without_replacement,
)
from prefix_filter_spark.streaming.reservoir import (
    streaming_weighted_reservoir,
)

TMP = "/tmp/pfs_stream_reservoir_test"


def _corpus(spark, n=500, n_src=4):
    return spark.range(n).select(
        F.col("id").cast("string").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % n_src).cast("string")).alias(
            "source"
        ),
        ((F.col("id") % 9) + 1).cast("double").alias("wgt"),
    )


def _drain(out, ckpt, name):
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240), "stream did not drain"


def _final_reservoir(spark, name):
    """Live sample = rows carrying each stratum's max n_seen (the
    memory sink keeps per-trigger snapshot history, like any
    append-style sink would). Computed driver-side here — the memory
    sink's view self-joins trip a Spark analyzer conflict, and test
    tables are tiny."""
    rows = spark.table(name).collect()
    mx = {}
    for r in rows:
        mx[r["stratum"]] = max(mx.get(r["stratum"], -1), r["n_seen"])
    return [r for r in rows if r["n_seen"] == mx[r["stratum"]]]


def test_stream_equals_batch_and_batch_boundary_free(spark):
    shutil.rmtree(TMP, ignore_errors=True)
    docs = _corpus(spark)
    want = {
        r["doc_id"]
        for r in weighted_sample_without_replacement(
            docs, 25, F.col("wgt"), "doc_id", seed=5
        ).collect()
    }
    # two chops of the same rows: 1 file (1 trigger) vs 10 files
    for label, n_files in (("one", 1), ("many", 10)):
        src = f"{TMP}/{label}/src"
        docs.repartition(n_files).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(
            "doc_id string, source string, wgt double"
        ).option("maxFilesPerTrigger", 1).parquet(src)
        out = streaming_weighted_reservoir(
            stream, 25, F.col("wgt"), "doc_id", seed=5
        )
        _drain(out, f"{TMP}/{label}/ckpt", f"res_{label}")
        final = _final_reservoir(spark, f"res_{label}")
        got = {r["doc_id"] for r in final}
        assert got == want, label
        # the recorded n_seen covers every positive-weight row
        assert max(r["n_seen"] for r in final) == 500
        # no snapshot ever exceeded k rows
        over = (
            spark.table(f"res_{label}")
            .groupBy("stratum", "n_seen")
            .count()
            .where(F.col("count") > 25)
            .count()
        )
        assert over == 0


def test_per_stratum_stream_equals_batch(spark):
    shutil.rmtree(f"{TMP}/strat", ignore_errors=True)
    docs = _corpus(spark)
    src = f"{TMP}/strat/src"
    docs.repartition(6).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "doc_id string, source string, wgt double"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    out = streaming_weighted_reservoir(
        stream, 8, F.col("wgt"), "doc_id", strata_col="source", seed=3
    )
    _drain(out, f"{TMP}/strat/ckpt", "res_strat")
    final = _final_reservoir(spark, "res_strat")
    got = {(r["stratum"], r["doc_id"]) for r in final}
    want = {
        (r["source"], r["doc_id"])
        for r in weighted_sample_per_stratum(
            docs, 8, F.col("wgt"), "source", "doc_id", seed=3
        ).collect()
    }
    assert got == want
    assert len({s for s, _ in got}) == 4 and len(got) == 32


def test_integer_ids_keep_native_tiebreak_and_type(spark):
    """Integer id column: the reservoir must preserve the id type end
    to end and order es_key ties numerically like the batch sampler
    (a string cast would order 10 before 9 lexically)."""
    shutil.rmtree(f"{TMP}/intid", ignore_errors=True)
    docs = spark.range(300).select(
        F.col("id").alias("doc_id"), F.lit(1.0).alias("wgt")
    )
    src = f"{TMP}/intid/src"
    docs.repartition(4).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("doc_id long, wgt double").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = streaming_weighted_reservoir(stream, 12, F.col("wgt"), "doc_id", seed=2)
    assert dict(out.dtypes)["doc_id"] == "bigint"
    _drain(out, f"{TMP}/intid/ckpt", "res_int")
    final = _final_reservoir(spark, "res_int")
    got = {r["doc_id"] for r in final}
    want = {
        r["doc_id"]
        for r in weighted_sample_without_replacement(
            docs, 12, F.col("wgt"), "doc_id", seed=2
        ).collect()
    }
    assert got == want
    assert all(isinstance(i, int) for i in got)
