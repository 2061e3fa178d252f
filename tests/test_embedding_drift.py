"""Per-group FD subspace drift: planted rotated subspace ranks first,
exact row/mass accounting, and the k<=ell guard."""

import numpy as np
import pytest

from prefix_filter_spark.operators.embedding_drift import embedding_subspace_drift


def _mk(spark, seed=4):
    """3 groups in the same 4-dim subspace of R^16, one group rotated
    into a disjoint 4-dim subspace."""
    rng = np.random.default_rng(seed)
    base = np.linalg.qr(rng.standard_normal((16, 8)))[0]  # orthonormal 16x8
    shared, rotated = base[:, :4], base[:, 4:]
    rows = []
    vid = 0
    for g, basis in [("a", shared), ("b", shared), ("c", shared), ("weird", rotated)]:
        n = 120 if g != "b" else 480  # one hot group exercises salting
        coeff = rng.standard_normal((n, 4))
        x = coeff @ basis.T
        for v in x:
            rows.append((vid, g, [float(t) for t in v]))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, group string, embedding array<double>"
    ).repartition(5)


def test_rotated_group_ranks_first_and_counts_exact(spark):
    df = _mk(spark)
    rep = embedding_subspace_drift(
        df, "group", dim=16, ell=8, k=4, salt_buckets=4
    ).collect()
    assert [r["group"] for r in rep][0] == "weird"
    drifts = {r["group"]: r["drift"] for r in rep}
    # disjoint subspaces: distance near 1 relative to the shared mass;
    # same-subspace groups score near the corpus (which is mostly shared)
    assert drifts["weird"] > 2 * max(drifts[g] for g in "abc")
    counts = {r["group"]: r["n_rows"] for r in rep}
    assert counts == {"a": 120, "b": 480, "c": 120, "weird": 120}
    # fro_sq is exact: matches NumPy per group
    pdf = df.toPandas()
    for r in rep:
        x = np.stack(pdf[pdf["group"] == r["group"]]["embedding"].to_numpy())
        assert r["fro_sq"] == pytest.approx(float((x * x).sum()), rel=1e-12)
        assert 0.0 <= r["err_bound"] <= 1.0 / 8 + 1e-12  # delta <= fro/ell


def test_partition_invariance_of_report(spark):
    df = _mk(spark, seed=9)
    a = embedding_subspace_drift(df, "group", dim=16, ell=8, k=4).collect()
    b = embedding_subspace_drift(df.repartition(11), "group", dim=16, ell=8, k=4).collect()
    # n_rows is exact under any partitioning; fro_sq is a float sum
    # whose accumulation order follows the salt grouping (invariant)
    # but whose partial contents follow partitioning — same value to
    # 1e-12 relative. The drift ORDER must agree.
    assert [(r["group"], r["n_rows"]) for r in a] == [
        (r["group"], r["n_rows"]) for r in b
    ]
    for ra, rb in zip(a, b):
        assert ra["fro_sq"] == pytest.approx(rb["fro_sq"], rel=1e-12)


def test_k_greater_than_ell_rejected(spark):
    df = _mk(spark)
    with pytest.raises(ValueError):
        embedding_subspace_drift(df, "group", dim=16, ell=4, k=8)
