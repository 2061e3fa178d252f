"""AMS tug-of-war sketch (sketches/ams.py): F2 / inner-product accuracy
on skewed data, merge algebra, partition invariance of the distributed
build, and the join_stats wrapper."""

import collections
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from prefix_filter_spark.hashing import as_u64
from prefix_filter_spark.sketches import ams

CFG = ams.AmsConfig(width=4096, depth=7, seed=42)


def _zipf_keys(n, a, mod, seed):
    rng = np.random.default_rng(seed)
    return (rng.zipf(a, size=n) % mod).astype(np.int64)


@pytest.fixture(scope="module")
def skewed():
    ka = _zipf_keys(200_000, 1.5, 5000, 1)
    kb = _zipf_keys(100_000, 1.3, 5000, 2)
    return ka, kb


def _state(keys):
    acc = ams.AmsAccumulator(CFG)
    acc.update(as_u64(keys).view(np.int64))
    return acc.to_bytes()


def test_f2_within_bound(skewed):
    ka, _ = skewed
    cnt = collections.Counter(ka.tolist())
    f2 = sum(c * c for c in cnt.values())
    est = ams.f2_estimate(_state(ka))
    assert abs(est - f2) <= 4 * CFG.rel_error_f2() * f2


def test_inner_product_estimates_join_rows(skewed):
    ka, kb = skewed
    ca, cb = collections.Counter(ka.tolist()), collections.Counter(kb.tolist())
    true_join = sum(c * cb.get(k, 0) for k, c in ca.items())
    f2a = sum(c * c for c in ca.values())
    f2b = sum(c * c for c in cb.values())
    est = ams.inner_product_estimate(_state(ka), _state(kb))
    assert abs(est - true_join) <= 4 * math.sqrt(2 * f2a * f2b / CFG.width)


def test_merge_is_exact_and_order_free(skewed):
    ka, _ = skewed
    whole = _state(ka)
    parts = [_state(ka[i::4]) for i in range(4)]
    assert ams.merge_states(parts) == whole
    assert ams.merge_states(parts[::-1]) == whole
    assert ams.merge_states(
        [ams.merge_states(parts[:2]), ams.merge_states(parts[2:])]
    ) == whole


def test_incompatible_states_raise(skewed):
    ka, _ = skewed
    other = ams.AmsAccumulator(ams.AmsConfig(width=2048, depth=7, seed=42))
    other.update(as_u64(ka[:100]).view(np.int64))
    with pytest.raises(ValueError, match="not comparable"):
        ams.inner_product_estimate(_state(ka), other.to_bytes())
    with pytest.raises(ValueError, match="different dims"):
        ams.merge_states([_state(ka), other.to_bytes()])


def test_distributed_build_partition_invariant(spark):
    """build_ams over 1 and 13 partitions produces byte-identical
    state (integer counters, elementwise-add merge)."""
    df = spark.range(0, 50_000).select((F.col("id") % 999).alias("k"))
    states = []
    for parts in (1, 13):
        rows = ams.build_ams(df.repartition(parts), "k", CFG).collect()
        assert len(rows) == 1
        states.append(bytes(rows[0]["state"]))
    assert states[0] == states[1]
    assert ams.total_count(states[0]) == 50_000
    # uniform ~50x multiplicity: F2 = 999 * ceil/floor mix of 50^2
    exact = 949 * 50 * 50 + 50 * 51 * 51
    assert abs(ams.f2_estimate(states[0]) - exact) <= 4 * CFG.rel_error_f2() * exact


def test_join_stats_wrapper(spark):
    from prefix_filter_spark.operators.join_stats import estimate_join_rows_ams

    fact = spark.range(0, 30_000).select((F.col("id") % 500).alias("k"))
    dim = spark.range(0, 500).select(F.col("id").alias("k"))
    est = estimate_join_rows_ams(fact, "k", dim, "k", CFG)
    assert abs(est.est_join_rows - 30_000) <= est.tolerance
    # dim keys unique -> F2(dim) == 500 within bound
    assert abs(est.f2_b - 500) <= 4 * CFG.rel_error_f2() * 500
