"""Z-order (Morton) clustering layout: multi-column scan pruning.

``sinks.write_bucketed`` optimizes ONE key's joins; this module
optimizes MULTI-column range predicates. Parquet/Iceberg/Delta prune
files and row groups by per-column min/max statistics — but a table
sorted on column A has useless (full-range) stats on column B, so a
query filtering on B scans everything. Z-ordering interleaves the bits
of several columns into one Morton code and lays the table out in
z-value order; every file then covers a small HYPER-RECTANGLE of the
combined key space, so min/max stats prune on EVERY z-dimension at
once (the same layout contract as Delta's ``OPTIMIZE ZORDER BY`` and
Iceberg's z-order rewrite — re-derived here over plain parquet).

Spark shapes:

- per-column normalization to a uint16 rank: numeric columns scale
  min/max (two-value agg, one tiny job); any column can instead rank
  by ``xxhash64`` bits (hash mode — uniform by construction, no stats
  pass, right for high-cardinality ids where locality means equality,
  not range).
- the Morton code is a pure Catalyst expression: bit interleave via
  shift-and-mask magic numbers unrolled over int64 (no Python, no
  UDF), pytest-pinned equal to a per-row Python reference.
- layout = ``repartitionByRange(z)`` (one range exchange — the same
  shuffle any global sort pays, amortized over every future scan) +
  ``sortWithinPartitions(z)`` + parquet write. Downstream pruning is
  then the *reader's* free lunch: Spark's parquet scan pushes the
  predicate into row-group stats automatically.

Locality guarantee tested (tests/test_zorder.py): for a square box
predicate over two z-ordered columns, the number of distinct output
partitions holding matches is O(perimeter) of the box rather than
O(partitions) — measured against a single-column sort which touches
~all partitions for a filter on the other column.

Reference scope: no counterpart in TomerEven/Prefix-Filter (a filter
library); this is engine infrastructure in the ``sources/sinks``
family next to bucketed writes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16-bit -> 32-bit bit-spreading magic numbers (standard Morton
# constants, e.g. Sean Eron Anderson's Bit Twiddling Hacks "Interleave
# bits by Binary Magic Numbers"); arithmetic stays in non-negative
# int64 so ANSI mode never sees an overflow.
_SPREAD_2 = ((16, 0x0000FFFF0000FFFF), (8, 0x00FF00FF00FF00FF),
             (4, 0x0F0F0F0F0F0F0F0F), (2, 0x3333333333333333),
             (1, 0x5555555555555555))


def _spread2(c: Column) -> Column:
    """Spread a uint16 value's bits to even positions of an int64."""
    out = c.cast("bigint")
    for shift, mask in _SPREAD_2:
        out = (out.bitwiseOR(F.shiftleft(out, shift))).bitwiseAND(F.lit(mask))
    return out


def spread_bits_py(v: int) -> int:
    """Per-row Python reference of ``_spread2`` (test oracle)."""
    out = v
    for shift, mask in _SPREAD_2:
        out = (out | (out << shift)) & mask
    return out


def _rank16(df: DataFrame, col: str, mode: str) -> Column:
    """Map a column to [0, 65535] for interleaving."""
    if mode == "hash":
        # low 16 bits of xxhash64 — uniform, no stats pass
        return F.pmod(F.xxhash64(F.col(col)), F.lit(65536)).cast("bigint")
    if mode == "minmax":
        lo, hi = df.agg(F.min(col), F.max(col)).first()
        span = float(hi) - float(lo)
        if span <= 0:
            return F.lit(0).cast("bigint")
        scaled = (F.col(col).cast("double") - F.lit(float(lo))) / F.lit(span)
        return F.least(
            F.floor(scaled * F.lit(65536.0)).cast("bigint"), F.lit(65535)
        )
    raise ValueError(f"unknown rank mode {mode!r}")


def zorder_value(
    df: DataFrame, cols: list[str], *, modes: list[str] | None = None
) -> Column:
    """Morton code of up to 2 columns as a Catalyst expression.

    Each column is normalized to uint16 (``minmax`` scaling for
    numerics — two tiny stats jobs — or ``hash`` for ids), then bit-
    interleaved: column 0 takes even bits, column 1 odd bits. Two
    16-bit dimensions fill 32 bits; the expression is pure JVM."""
    if len(cols) != 2:
        raise ValueError("zorder_value interleaves exactly 2 columns")
    modes = modes or ["minmax"] * len(cols)
    r0 = _spread2(_rank16(df, cols[0], modes[0]))
    r1 = _spread2(_rank16(df, cols[1], modes[1]))
    return r0.bitwiseOR(F.shiftleft(r1, 1))


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    num_partitions: int,
    *,
    modes: list[str] | None = None,
    z_col: str = "_z",
    keep_z: bool = False,
) -> DataFrame:
    """Cluster ``df`` in z-order: ONE range exchange on the Morton
    code + an in-partition sort. Write the result with plain
    ``.write.parquet(...)``; every file then holds a z-contiguous
    hyper-rectangle and parquet min/max stats prune on both columns."""
    z = df.withColumn(z_col, zorder_value(df, cols, modes=modes))
    out = z.repartitionByRange(num_partitions, z_col).sortWithinPartitions(z_col)
    return out if keep_z else out.drop(z_col)
