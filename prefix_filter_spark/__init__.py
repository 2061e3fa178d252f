"""prefix_filter_spark — a PySpark-native distributed sketch / approximate-
aggregation library.

Brand-new engine (not a port) with the capabilities of the reference AMQ
filter library TomerEven/Prefix-Filter (PVLDB 15(7), arXiv:2203.17139):
prefix-filter approximate membership (pocket-dictionary L1 + spare L2),
Bloom, HyperLogLog, count-min, KLL, t-digest, KMV/theta, Misra-Gries,
DDSketch, AMS, frequent-directions and a static Xor filter — all built
as mergeable,
associative aggregators over DataFrames of pre-tokenized sequences
``(doc_id string, tokens array<int32>, n_tok int, source string)``,
using vectorized pandas/Arrow UDFs (no per-row Python).

Design (SURVEY.md §7): a filter of capacity n is sharded by the top bits
of a 64-bit key hash into S independent filters; every key belongs to
exactly one shard, so a full filter is a DataFrame of shard rows
``(shard_id int, state binary, meta...)`` and merge is an associative,
commutative combine of same-shard states (bitwise OR for Bloom,
keep-k-smallest + spare-OR for the prefix filter, register-max for HLL,
counter-add for CMS).
"""

__version__ = "0.1.0"

from prefix_filter_spark.session import get_spark  # noqa: F401
