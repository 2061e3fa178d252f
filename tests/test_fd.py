"""Frequent Directions matrix sketch: exact-certificate bound tests.

The FD state carries its accumulated shrink mass ``delta`` exactly, so
every test asserts the REAL guarantee chain on dense references:

    A'A - B'B is PSD (undershoot only),
    ||A'A - B'B||_2 <= delta,
    delta <= ||A||_F^2 / ell,

with no slack invented by the test. n_rows and fro_sq are exact and
partition-invariant; the B rows themselves are only bound-invariant.
"""

import numpy as np
import pytest

from prefix_filter_spark.sketches import fd


def _rand(n, d, seed, rank=None):
    rng = np.random.default_rng(seed)
    if rank is None:
        return rng.standard_normal((n, d))
    # planted low-rank + noise: top directions should be recoverable
    u = rng.standard_normal((n, rank))
    v = np.linalg.qr(rng.standard_normal((d, rank)))[0].T
    scales = np.linspace(10.0, 5.0, rank)[:, None]
    return u @ (scales * v) + 0.05 * rng.standard_normal((n, d))


def _sketch(mat, ell, batches=7):
    acc = fd.FdAccumulator(fd.FdConfig(ell=ell, dim=mat.shape[1]))
    for part in np.array_split(mat, batches):
        if len(part):
            acc.update(part)
    return acc.to_bytes()


def _assert_bound(mat, state, ell):
    exact = mat.T @ mat
    approx = fd.gram_estimate(state)
    diff = exact - approx
    eigs = np.linalg.eigvalsh(diff)
    fro = float(np.einsum("ij,ij->", mat, mat))
    eps = 1e-6 * max(fro, 1.0)
    assert eigs.min() >= -eps, "sketch overshot the Gram (must undershoot)"
    delta = fd.shrink_mass(state)
    assert eigs.max() <= delta + eps, "spectral error exceeds tracked delta"
    assert delta <= fro / ell + eps, "delta exceeds the ||A||_F^2/ell bound"
    assert fd.n_rows(state) == len(mat)
    assert fd.frobenius_sq(state) == pytest.approx(fro, rel=1e-12)


def test_exact_regime_small_input():
    # fewer than ell rows: B'B == A'A exactly (no shrink ever fires)
    a = _rand(10, 8, seed=1)
    st = _sketch(a, ell=16)
    assert fd.shrink_mass(st) == 0.0
    np.testing.assert_allclose(fd.gram_estimate(st), a.T @ a, rtol=1e-10)


def test_bound_holds_dense_stream():
    a = _rand(500, 32, seed=2)
    _assert_bound(a, _sketch(a, ell=12), ell=12)


def test_bound_holds_low_rank_stream():
    a = _rand(400, 48, seed=3, rank=5)
    st = _sketch(a, ell=10)
    _assert_bound(a, st, ell=10)
    # planted top direction is recovered
    _, vt = fd.top_directions(st, 1)
    _, _, true_vt = np.linalg.svd(a, full_matrices=False)
    assert abs(float(vt[0] @ true_vt[0])) > 0.99


def test_merge_preserves_bound_and_exact_ledger():
    a = _rand(600, 24, seed=4)
    parts = np.array_split(a, 5)
    merged = fd.merge_states([_sketch(p, ell=8, batches=2) for p in parts])
    _assert_bound(a, merged, ell=8)


def test_partition_invariance_of_ledger():
    # rows of B vary with partitioning; n_rows/fro_sq must not, and the
    # bound must hold for every partitioning
    a = _rand(300, 16, seed=5)
    rng = np.random.default_rng(6)
    ref_n, ref_f = None, None
    for n_parts in (1, 3, 9):
        perm = rng.permutation(len(a))
        parts = np.array_split(a[perm], n_parts)
        st = fd.merge_states([_sketch(p, ell=6, batches=3) for p in parts])
        _assert_bound(a, st, ell=6)
        if ref_n is None:
            ref_n, ref_f = fd.n_rows(st), fd.frobenius_sq(st)
        assert fd.n_rows(st) == ref_n
        assert fd.frobenius_sq(st) == pytest.approx(ref_f, rel=1e-12)


def test_mismatched_configs_rejected():
    a = _rand(50, 8, seed=7)
    with pytest.raises(ValueError):
        fd.merge_states([_sketch(a, ell=4), _sketch(a, ell=6)])
    acc = fd.FdAccumulator(fd.FdConfig(ell=4, dim=16))
    with pytest.raises(ValueError):
        acc.update(a)  # dim mismatch


def test_subspace_distance_detects_drift():
    rng = np.random.default_rng(8)
    base_dirs = np.linalg.qr(rng.standard_normal((32, 3)))[0].T
    a = rng.standard_normal((400, 3)) @ (5.0 * base_dirs)
    a += 0.01 * rng.standard_normal(a.shape)
    b_same = rng.standard_normal((400, 3)) @ (5.0 * base_dirs)
    b_same += 0.01 * rng.standard_normal(b_same.shape)
    other_dirs = np.linalg.qr(rng.standard_normal((32, 3)))[0].T
    b_drift = rng.standard_normal((400, 3)) @ (5.0 * other_dirs)
    sa = _sketch(a, ell=8)
    assert fd.subspace_distance(sa, _sketch(b_same, ell=8), k=3) < 0.05
    assert fd.subspace_distance(sa, _sketch(b_drift, ell=8), k=3) > 0.5


def test_spark_build_matches_bound(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = emb.select("embedding").collect()
    a = np.array([r["embedding"] for r in rows], dtype=np.float64)
    cfg = fd.FdConfig(ell=16, dim=a.shape[1])
    st = fd.sketch_bytes(emb.repartition(6), "embedding", cfg)
    _assert_bound(a, st, ell=16)
