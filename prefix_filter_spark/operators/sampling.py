"""Deterministic sampling for training-data mixtures.

Two regimes, both reproducible run-over-run (a training pipeline must
be able to regenerate the exact same mixture):

- ``bernoulli_sample`` — map-only hash-threshold sampling. Zero
  shuffle, streams at scan speed, fraction is approximate (binomial
  around ``frac``). This is the 100 TB default.
- ``stratified_sample_exact`` — exactly ``ceil(frac_s * n_s)`` rows per
  stratum, chosen by rank over a deterministic order hash. Costs one
  shuffle on the stratum key plus a per-stratum sort; right when strata
  are many and individually task-sized (the usual `source` layout).
  A single giant stratum serializes its sort into one task — for that
  shape use ``bernoulli_sample`` per stratum, or salt the stratum and
  accept per-salt rounding.

Mixture weighting: ``fracs`` maps stratum value -> sampling rate, the
"2 epochs of wikipedia, 0.3 of common-crawl" knob; strata absent from
the map fall back to ``default_frac`` (0 drops them, the usual intent
for an explicit mixture).

No reference-repo counterpart (the C++ library has no pipeline ops);
this extends the training-data operator family per the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bernoulli_sample(df: DataFrame, frac: float, hash_col: Column) -> DataFrame:
    """Keep rows whose 64-bit hash falls under frac of the hash space.

    ``hash_col`` should be a deterministic per-row hash, e.g.
    ``F.xxhash64("doc_id", F.lit(seed))`` — the same seed reproduces
    the same sample; a different seed draws an independent one.
    Map-only: survives any scale, fraction accurate to O(1/sqrt(n)).
    """
    if not 0.0 <= frac <= 1.0:
        raise ValueError("frac must be in [0, 1]")
    if frac >= 1.0:
        return df  # keep everything; 2^63 as a bound would not fit int64
    # xxhash64 is signed; shift into [0, 2^64) via unsigned reinterpret.
    # Clamp: a double product that rounds up to 2^64 must not produce a
    # bound outside LongType.
    bound = min(int(frac * float(2**64)), 2**64 - 1) - 2**63
    return df.where(hash_col <= F.lit(bound))


def _literal_map_col(strata_col: str, mapping: dict, default, cast) -> Column:
    """Nested-CASE lookup column for a small driver-side stratum map
    (mixture knobs are a handful of sources; sorted for a deterministic
    expression). Shared by the rate-based and fixed-k samplers."""
    col = F.lit(cast(default))
    for s, v in sorted(mapping.items()):
        col = F.when(F.col(strata_col) == F.lit(s), F.lit(cast(v))).otherwise(col)
    return col


def stratified_sample_exact(
    df: DataFrame,
    strata_col: str,
    fracs: dict[str, float] | float,
    order_col: Column,
    tie_col: str,
    default_frac: float = 0.0,
) -> DataFrame:
    """Exactly ``ceil(frac * n_stratum)`` rows per stratum: rank rows by
    (order_col, tie_col) within the stratum and keep the head.

    ``order_col`` is the deterministic shuffle key (a hash of the row
    id); ``tie_col`` must be unique per row so the result is total-order
    stable. The output carries ``n_total`` (stratum size) alongside the
    sampled rows, so downstream bookkeeping needs no second count.
    """
    if isinstance(fracs, dict):
        frac_col = _literal_map_col(strata_col, fracs, default_frac, float)
    else:
        frac_col = F.lit(float(fracs))
    w = Window.partitionBy(strata_col)
    ranked = df.withColumn(
        "_rk", F.row_number().over(w.orderBy(order_col, F.col(tie_col)))
    ).withColumn("n_total", F.count("*").over(w))
    return ranked.where(
        F.col("_rk") <= F.ceil(frac_col * F.col("n_total"))
    ).drop("_rk")


def weighted_sample_without_replacement(
    df: DataFrame,
    k: int,
    weight_col: Column,
    id_col: str,
    seed: int = 0,
) -> DataFrame:
    """Exactly ``k`` rows drawn WITHOUT replacement with probability
    proportional to ``weight_col`` — Efraimidis-Spirakis (2006)
    weighted reservoir sampling, the standard distributed form: each
    row gets the key ln(U)/w for a deterministic per-row uniform
    U = (unsigned(xxhash64(id, seed)) + 0.5) / 2^64, and the k LARGEST
    keys win (equivalent to ranking by U^(1/w); the Gumbel-top-k
    trick). Temperature-weighted data mixing is ``weight_col =
    F.pow(quality, 1/T)``.

    Scale shape: the key is one map-side expression; the selection is
    a TakeOrdered (per-partition top-k, then a k-row merge on the
    driver side of the shuffle) — no global sort, no full shuffle.
    Deterministic: same (data, seed) -> same sample on ANY
    partitioning (ties broken by ``id_col``; exact-equality pinned in
    tests). Zero/negative weights are rejected rows (they can never
    win): filtered out up front so ln stays finite.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    return (
        df.where(weight_col > 0)
        .withColumn("_es_key", es_key(weight_col, id_col, seed))
        .orderBy(F.col("_es_key").desc(), F.col(id_col))
        .limit(k)
        .drop("_es_key")
    )


def es_key(weight_col: Column, id_col: str, seed: int = 0) -> Column:
    """The Efraimidis-Spirakis selection key ln(U)/w as a Catalyst
    expression (U a deterministic per-row uniform from xxhash64):
    the k rows with the LARGEST keys are a weight-proportional sample
    without replacement. Shared by the batch TakeOrdered sampler, the
    per-stratum sampler, and the streaming reservoir (same key ->
    stream == batch bit-for-bit)."""
    u = (
        (F.xxhash64(F.col(id_col), F.lit(seed)).cast("double"))
        + F.lit(2.0**63)
        + F.lit(0.5)
    ) / F.lit(2.0**64)
    return F.log(u) / weight_col


def weighted_sample_per_stratum(
    df: DataFrame,
    ks: dict[str, int] | int,
    weight_col: Column,
    strata_col: str,
    id_col: str,
    seed: int = 0,
) -> DataFrame:
    """Exactly ``min(k_s, n_s)`` rows per stratum, weight-proportional
    without replacement within each stratum (Efraimidis-Spirakis per
    group) — "k docs per source, favoring high quality", the
    fixed-size-per-source mixture knob beside the rate-based
    ``stratified_sample_exact``.

    One shuffle on the stratum key, then a per-stratum window top-k.
    Strata are many and task-sized in the usual `source` layout; a
    single giant stratum serializes its sort into one task (same
    caveat as stratified_sample_exact — use the global TakeOrdered
    sampler per pre-filtered stratum for that shape)."""
    if isinstance(ks, dict):
        k_col = _literal_map_col(strata_col, ks, 0, int)
    else:
        k_col = F.lit(int(ks))
    w = Window.partitionBy(strata_col).orderBy(
        F.col("_es_key").desc(), F.col(id_col)
    )
    return (
        df.where(weight_col > 0)
        .withColumn("_es_key", es_key(weight_col, id_col, seed))
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k_col)
        .drop("_es_key", "_rk")
    )
