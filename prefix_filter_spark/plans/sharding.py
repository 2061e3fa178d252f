"""Shard routing as Catalyst expressions (JVM-side, codegen'd).

The distributed design (SURVEY.md §7): a sketch of capacity n is S
independent shards; key -> shard via Lemire fastrange on the top 32 bits
of ``xxhash64(key, seed)``. The concatenation of shards is semantically
one big filter (generalizes ``pd_index = reduce32(hi32(h), num_pd)`` at
``/root/reference/Tests/wrappers.hpp:648-654`` to two levels:
shard = fastrange(hi32, S), pocket dictionary within shard from a
splitmix64 remix).

Keeping routing in Catalyst means the build's only shuffle — the
groupBy(shard) — is planned by Spark (AQE can coalesce/split), filters
and column pruning push into the scan, and no Python runs before the
shuffle. ``hi32 * S`` stays < 2^63 for any realistic shard count, so the
expression is safe under ANSI arithmetic too.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hashed_key_col(key: Column | str, seed: int) -> Column:
    """64-bit base hash of a key column: xxhash64(key, seed).

    Seed is passed as a chained hash input (Spark's xxhash64 takes a
    fixed internal seed; appending a literal seed column makes the
    family explicitly seeded, replacing the reference's per-instance
    urandom seeding at /root/reference/hashutil.h:40-53).
    """
    col = F.col(key) if isinstance(key, str) else key
    return F.xxhash64(col, F.lit(int(seed)))


def widen_key_col(df, key: Column | str) -> Column:
    """Pin integral key columns to the 8-byte hash path.

    ``F.xxhash64`` dispatches on the column's STORAGE width — an
    int/smallint/tinyint column takes the JVM's 4-byte ``hashInt``
    kernel while the driver-side NumPy twins (``hashing
    .spark_xxhash64_long``, used by ``probe_keys_local`` /
    ``hash_probe_keys``) implement the 8-byte ``hashLong`` path. A
    filter built over a narrow integral column would therefore answer
    every driver-side probe with a silent false negative. Resolving the
    expression's dataType against ``df`` (analysis-only — no job) and
    widening integral types to bigint makes every build/probe/delete
    path hash integral keys at one canonical width. Non-integral types
    (string, binary, ...) pass through untouched.
    """
    from pyspark.sql.types import ByteType, IntegerType, ShortType

    col = F.col(key) if isinstance(key, str) else key
    dt = df.select(col).schema[0].dataType
    if isinstance(dt, (ByteType, ShortType, IntegerType)):
        return col.cast("bigint")
    return col  # bigint already canonical; other types keep their own kernel


def shard_col(h: Column, num_shards: int) -> Column:
    """fastrange32(hi32(h), S) as a Catalyst expression.

    Arithmetic-identical to ``hashing.shard_of`` (NumPy probe path):
    hi32 is unsigned (shiftrightunsigned), hi32 * S < 2^63, and the
    final >> 32 on a non-negative value matches unsigned shift.
    """
    hi32 = F.shiftrightunsigned(h, 32)
    return F.shiftright(hi32 * F.lit(int(num_shards)), 32).cast("int")
