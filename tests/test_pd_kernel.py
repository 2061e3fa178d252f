"""Batch kernel vs pure-Python sequential model — the reference's
naive-vs-optimized cross-check pattern (SURVEY.md §5; e.g. get_capacity
vs get_cap_naive at /root/reference/Prefix-Filter/min_pd256.hpp:117-123).
"""

import numpy as np
import pytest

from prefix_filter_spark.sketches import pd_kernel


def _random_stream(rng, num_pd, n):
    pd_idx = rng.integers(0, num_pd, n)
    qr = rng.integers(0, pd_kernel.QR_SPACE, n)
    return pd_idx.astype(np.int64), qr.astype(np.int64)


def test_header_roundtrip():
    rng = np.random.default_rng(0)
    num_pd = 200
    counts_q = np.zeros((num_pd, 25), dtype=np.int64)
    for p in range(num_pd):
        total = rng.integers(0, 26)
        for _ in range(total):
            counts_q[p, rng.integers(0, 25)] += 1
    overflowed = rng.random(num_pd) < 0.3
    last_quot = rng.integers(0, 25, num_pd)
    last_quot[~overflowed] = 0
    headers = pd_kernel.encode_headers(counts_q, overflowed, last_quot)
    counts_incl, got_over, got_lq = pd_kernel.decode_headers(headers)
    expect_incl = counts_q.cumsum(axis=1)
    assert (counts_incl == expect_incl).all()
    assert (got_over == overflowed).all()
    assert (got_lq == last_quot).all()


@pytest.mark.parametrize("seed,load", [(1, 0.5), (2, 0.95), (3, 1.4), (4, 3.0)])
def test_batch_build_equals_sequential_model(seed, load):
    """Batch keep-25-smallest must equal sequential swap-max for ANY
    arrival order (min_pd256.hpp:416-447 protocol)."""
    rng = np.random.default_rng(seed)
    num_pd = 40
    n = int(num_pd * 25 * load)
    pd_idx, qr = _random_stream(rng, num_pd, n)

    model = pd_kernel.SequentialPDModel(num_pd)
    order = rng.permutation(n)
    for i in order:
        model.add(int(pd_idx[i]), int(qr[i]))

    headers, body, ev_pd, ev_qr, n_l1 = pd_kernel.build_pds(pd_idx, qr, num_pd)
    counts_incl, overflowed, last_quot = pd_kernel.decode_headers(headers)

    assert (overflowed == np.array(model.overflowed)).all()
    spare_batch = set(zip(ev_pd.tolist(), ev_qr.tolist()))
    assert spare_batch == model.spare
    for p in range(num_pd):
        items = model.pds[p]
        cap = counts_incl[p, -1]
        assert cap == len(items)
        got = [
            (int((counts_incl[p] <= j).sum()) << 8) | int(body[p, j])
            for j in range(cap)
        ]
        assert got == items
        if model.overflowed[p]:
            assert last_quot[p] == model.last_quot(p)

    # every key answers contains() identically, batch vs model
    probe_pd, probe_qr = _random_stream(np.random.default_rng(99), num_pd, 2000)
    probe_pd = np.concatenate([probe_pd, pd_idx])
    probe_qr = np.concatenate([probe_qr, qr])
    max_qr = pd_kernel.max_qr_of(body, counts_incl, overflowed, last_quot)
    l1_hit, route_spare = pd_kernel.probe_pds(
        counts_incl, overflowed, max_qr, body, probe_pd, probe_qr
    )
    batch_ans = l1_hit | (
        route_spare
        & np.array([(int(p), int(q)) in spare_batch for p, q in zip(probe_pd, probe_qr)])
    )
    model_ans = np.array(
        [model.contains(int(p), int(q)) for p, q in zip(probe_pd, probe_qr)]
    )
    assert (batch_ans == model_ans).all()


def test_inserted_keys_never_routed_wrong():
    """No false negatives at the kernel level: every inserted pair is
    found in L1 or routed to the spare where it was evicted to."""
    rng = np.random.default_rng(7)
    num_pd = 64
    pd_idx, qr = _random_stream(rng, num_pd, 64 * 30)
    headers, body, ev_pd, ev_qr, _ = pd_kernel.build_pds(pd_idx, qr, num_pd)
    counts_incl, overflowed, last_quot = pd_kernel.decode_headers(headers)
    max_qr = pd_kernel.max_qr_of(body, counts_incl, overflowed, last_quot)
    l1_hit, route_spare = pd_kernel.probe_pds(
        counts_incl, overflowed, max_qr, body, pd_idx, qr
    )
    spare = set(zip(ev_pd.tolist(), ev_qr.tolist()))
    in_spare = np.array([(int(p), int(q)) in spare for p, q in zip(pd_idx, qr)])
    assert (l1_hit | (route_spare & in_spare)).all()
    # routing is exclusive: never both
    assert not (l1_hit & route_spare).any()
