"""Sequence packing: assign tokenized docs to fixed-budget training packs.

The standard LLM pre-training step (GPT-style "concat and split"):
documents are laid out in a deterministic global order, their token
streams concatenated, and the stream cut every ``budget`` tokens. Each
document's pack is the pack in which its first token lands:

    offset(d) = sum of n_tok over all docs ordered before d
    pack_id(d) = offset(d) // budget

Spark-first scale design — the naive expression is a global
``sum() OVER (ORDER BY ...)`` window, which Spark executes as a
SINGLE task holding the whole table (a 100 TB cliff). Instead this is
a classic two-pass distributed prefix-sum:

1. one tiny agg reads (min, max) of the order column;
2. rows map deterministically to ``num_buckets`` ordered range buckets
   by linear interpolation — deterministic across scans, so no cache()
   of a shuffled frame is needed for plan re-execution;
3. one grouped agg computes per-bucket token totals; the driver folds
   them into exclusive bucket offsets (``num_buckets`` rows — bounded,
   never the data);
4. one hash repartition on the bucket id + within-partition sort, then
   an Arrow ``mapInPandas`` adds bucket offset + local running sum.

Total cost: 2 scans, 1 shuffle of the data, driver state = one row per
bucket. Buckets are balanced when the order key is roughly dense
(sequence ids from a generation pipeline are); for clustered ids pass
a larger ``num_buckets`` — correctness never depends on balance, only
task sizing does.

No reference-repo counterpart (the C++ library has no pipeline ops);
this extends the training-data operator family per the build brief.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_assignments(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    budget: int,
    num_buckets: int | None = None,
    partition_col: str | None = None,
) -> DataFrame:
    """Add ``tok_offset`` (exclusive prefix sum of ``weight_col`` in
    ``order_col`` order) and ``pack_id`` (= tok_offset // budget).

    ``order_col`` must be unique per row (e.g. doc_id) — it defines the
    global concatenation order. ``weight_col`` must be a non-negative
    integral token count.

    ``partition_col`` switches to GROUPED packing (the curriculum /
    per-mixture-source shard shape): offsets and pack ids are computed
    independently within each group, namespaced by the group value.
    Driver state grows to one row per (group, bucket) — fine for
    mixture-source cardinalities (10s-1000s); for millions of groups
    run per-group jobs instead (documented limit).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    spark = df.sparkSession
    if num_buckets is None:
        num_buckets = spark.sparkContext.defaultParallelism

    bounds = df.agg(
        F.min(order_col).alias("lo"), F.max(order_col).alias("hi")
    ).collect()[0]
    if bounds["lo"] is None:
        return df.withColumn("tok_offset", F.lit(None).cast("long")).withColumn(
            "pack_id", F.lit(None).cast("long")
        ).limit(0)
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    span = hi - lo + 1
    num_buckets = max(1, min(num_buckets, span))
    # deterministic ordered range bucket: floor((x - lo) * B / span)
    bucket = F.floor(
        (F.col(order_col).cast("long") - F.lit(lo)) * F.lit(num_buckets) / F.lit(span)
    ).cast("int")
    with_b = df.withColumn("_bucket", bucket)

    grp_keys = [partition_col] if partition_col else []
    totals = (
        with_b.groupBy(*grp_keys, "_bucket")
        .agg(F.sum(F.col(weight_col).cast("long")).alias("w"))
        .collect()
    )
    # exclusive prefix offsets per group (group = () when ungrouped)
    offsets: dict[tuple, int] = {}
    acc_by_group: dict[tuple, int] = {}
    for r in sorted(
        totals, key=lambda r: (tuple(r[k] for k in grp_keys), r["_bucket"])
    ):
        g = tuple(r[k] for k in grp_keys)
        offsets[(g, r["_bucket"])] = acc_by_group.get(g, 0)
        acc_by_group[g] = acc_by_group.get(g, 0) + int(r["w"])

    cols = [f.name for f in with_b.schema.fields]
    # StructType.add mutates in place — build a fresh schema instead
    out_schema = T.StructType(
        list(with_b.schema.fields)
        + [T.StructField("tok_offset", T.LongType()), T.StructField("pack_id", T.LongType())]
    )

    def assign(batches):
        consumed: dict[tuple, int] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            gvals = (
                list(zip(*(pdf[k] for k in grp_keys)))
                if grp_keys
                else [()] * len(pdf)
            )
            offs = []
            for g, b, w in zip(gvals, pdf["_bucket"], pdf[weight_col]):
                key = (g, int(b))
                base = offsets[key] + consumed.get(key, 0)
                offs.append(base)
                consumed[key] = consumed.get(key, 0) + int(w)
            out = pdf[cols].copy()
            out["tok_offset"] = pd.Series(offs, index=pdf.index, dtype="int64")
            out["pack_id"] = out["tok_offset"] // budget
            yield out

    return (
        with_b.repartition(num_buckets, "_bucket")
        .sortWithinPartitions("_bucket", order_col)
        .mapInPandas(assign, schema=out_schema)
        .drop("_bucket")
    )


def pack_summary(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    budget: int,
    num_buckets: int | None = None,
) -> DataFrame:
    """Per-pack roll-up: docs per pack, tokens STARTING in the pack, and
    the doc-id range — the manifest a dataloader shards by."""
    packed = pack_assignments(df, order_col, weight_col, budget, num_buckets)
    return (
        packed.groupBy("pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col(weight_col).cast("long")).alias("n_tokens"),
            F.min(order_col).alias("first_doc"),
            F.max(order_col).alias("last_doc"),
        )
        .orderBy("pack_id")
    )
