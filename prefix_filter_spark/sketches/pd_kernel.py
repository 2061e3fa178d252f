"""Pocket-dictionary (PD) batch kernel — NumPy re-derivation of the
reference's min_pd256 (``/root/reference/Prefix-Filter/min_pd256.hpp``).

A PD stores up to 25 (quot, rem) pairs, quot in [0,25), rem in [0,256)
(``min_pd256.hpp:31-33``: QUOTS=25, MAX_CAP0=25). Layout per PD,
mirrored bit-for-bit in our serialized header word:

- bits 0-4:  last_quot of the overflowed PD (``min_pd256.hpp:99-101``)
- bit 5:     NOT-overflowed flag (set = clean; ``min_pd256.hpp:81-97``)
- bits 6-55: 50-bit unary header — 25 quotient runs over <=25 slots
             (``min_pd256.hpp:72-79``); run q's items are the zeros
             before the q-th one bit
- body:      25 bytes of remainders grouped by quotient, each run
             sorted ascending (``sort_k_last_rem``, min_pd256.hpp:253-283
             keeps the last run sorted; batch rebuild keeps *all* runs
             sorted, a strict superset of that invariant)

Semantics difference vs the C++: the reference inserts one key at a
time, evicting the running maximum (quot,rem) when full
(``new_pd_swap_short``, min_pd256.hpp:416-447). Sequential evict-max
over any arrival order retains exactly the 25 smallest pairs, so the
batch rule "keep the 25 smallest, evict the rest to the spare"
reproduces the final state for any order (SURVEY.md §2.2). We use *set*
semantics for (pd, quot, rem) triples — deduping makes shard-state
merge bit-identical to a single-pass build, which the reference's
random-seeded multiset build cannot offer.

Everything below is vectorized over whole shards: (num_pd, 25) body
matrix + uint64 header array; probes for a whole Arrow batch are one
boolean-matrix reduction (the NumPy analogue of the AVX2 byte-compare
at min_pd256.hpp:503-504).
"""

from __future__ import annotations

import numpy as np

QUOTS = 25
MAX_CAP = 25
QR_SPACE = QUOTS * 256  # 6400, wrappers.hpp:642-645
_NOT_OVERFLOWED = np.uint64(1 << 5)
_LAST_QUOT_MASK = np.uint64(0x1F)


def encode_headers(
    counts_q: np.ndarray, overflowed: np.ndarray, last_quot: np.ndarray
) -> np.ndarray:
    """(num_pd, 25) per-quot counts -> uint64 headers (reference layout)."""
    n = counts_q.shape[0]
    # one bit for quot q sits at (#items in quots <= q) + q, shifted by 6
    pos = counts_q.cumsum(axis=1, dtype=np.int64) + np.arange(QUOTS, dtype=np.int64)
    bits = np.zeros((n, 64), dtype=np.uint8)
    rows = np.repeat(np.arange(n), QUOTS)
    bits[rows, (pos + 6).ravel()] = 1
    headers = (
        np.packbits(bits, axis=1, bitorder="little")
        .copy()
        .view(np.uint64)
        .ravel()
    )
    headers |= np.where(overflowed, np.uint64(0), _NOT_OVERFLOWED)
    headers |= last_quot.astype(np.uint64) & _LAST_QUOT_MASK
    return headers


def decode_headers(headers: np.ndarray):
    """headers -> (counts_incl (num_pd,25) int64 cumulative, overflowed, last_quot).

    counts_incl[p, q] = #items with quot <= q — i.e. the run boundaries:
    run q occupies body[counts_incl[p,q-1] : counts_incl[p,q]].
    Vectorized select64 analogue (min_pd256.hpp:48-52): instead of
    PDEP/TZCNT per query, decode each PD's 25 one-positions once.
    """
    n = len(headers)
    bits = np.unpackbits(
        headers.astype(np.uint64).reshape(-1, 1).view(np.uint8),
        axis=1,
        bitorder="little",
    )[:, 6:56]
    flat_ones = np.flatnonzero(bits.ravel())
    pos = (flat_ones.reshape(n, QUOTS) - (np.arange(n) * 50)[:, None]).astype(np.int64)
    counts_incl = pos - np.arange(QUOTS, dtype=np.int64)
    overflowed = (headers & _NOT_OVERFLOWED) == 0
    last_quot = (headers & _LAST_QUOT_MASK).astype(np.int64)
    return counts_incl, overflowed, last_quot


def build_pds(pd_idx: np.ndarray, qr: np.ndarray, num_pd: int):
    """Batch-build all PDs of a shard from its (pd, qr) pairs.

    Returns (headers u64[num_pd], body u8[num_pd,25],
             evict_pd int64[], evict_qr int64[], n_l1 int).

    Equivalent end state to per-key Add (wrappers.hpp:675-720): for each
    PD keep the 25 smallest distinct qr, evict the rest (min_pd256.hpp:
    416-447 swap-max protocol, batch form).
    """
    # pack (pd, qr) into ONE integer so a single sort does dedupe +
    # group + in-group order; u32 when the product space fits (shards
    # up to ~671k PDs ~ 15.9M keys) — narrower sort keys and division
    # measured 1.15-1.36x faster, bit-identical output
    if num_pd * QR_SPACE < 2**32:
        combined = np.unique(
            pd_idx.astype(np.uint32) * np.uint32(QR_SPACE) + qr.astype(np.uint32)
        )
        pd_s = (combined // np.uint32(QR_SPACE)).astype(np.int64)
        qr_s = (combined % np.uint32(QR_SPACE)).astype(np.int64)
    else:
        combined = np.unique(
            pd_idx.astype(np.uint64) * np.uint64(QR_SPACE) + qr.astype(np.uint64)
        )
        pd_s = (combined // np.uint64(QR_SPACE)).astype(np.int64)
        qr_s = (combined % np.uint64(QR_SPACE)).astype(np.int64)

    counts_all = np.bincount(pd_s, minlength=num_pd)
    starts = np.concatenate(([0], counts_all.cumsum()))[:-1]
    rank = np.arange(len(pd_s)) - starts[pd_s]
    retained = rank < MAX_CAP

    quot_s = qr_s >> 8
    rem_s = qr_s & 0xFF

    body = np.zeros((num_pd, MAX_CAP), dtype=np.uint8)
    body[pd_s[retained], rank[retained]] = rem_s[retained]

    counts_q = np.bincount(
        pd_s[retained] * QUOTS + quot_s[retained], minlength=num_pd * QUOTS
    ).reshape(num_pd, QUOTS)

    overflowed = counts_all > MAX_CAP
    last_quot = np.zeros(num_pd, dtype=np.int64)
    if overflowed.any():
        # quot of the 25th-smallest (the retained max) per overflowed PD
        idx_25 = starts[overflowed] + MAX_CAP - 1
        last_quot[overflowed] = quot_s[idx_25]

    headers = encode_headers(counts_q, overflowed, last_quot)
    return headers, body, pd_s[~retained], qr_s[~retained], int(retained.sum())


def probe_pds(
    counts_incl: np.ndarray,
    overflowed: np.ndarray,
    max_qr: np.ndarray,
    body: np.ndarray,
    pd_idx: np.ndarray,
    qr: np.ndarray,
):
    """Vectorized Contain over one shard: returns (l1_hit, route_spare).

    Routing = cmp_qr1 (min_pd256.hpp:536-544): overflowed PD and
    qr > (last_quot<<8 | last_rem)  =>  the key can only live in the
    spare — never probe both (min_pd256.hpp:528-544).
    L1 probe = find_core (min_pd256.hpp:499-525): byte-compare the run
    [begin, end) against rem.
    """
    quot = qr >> 8
    rem = (qr & 0xFF).astype(np.uint8)
    route_spare = overflowed[pd_idx] & (qr > max_qr[pd_idx])

    begin = np.where(
        quot > 0, counts_incl[pd_idx, np.maximum(quot - 1, 0)], 0
    )
    end = counts_incl[pd_idx, quot]
    cols = np.arange(MAX_CAP)[None, :]
    in_run = (cols >= begin[:, None]) & (cols < end[:, None])
    l1_hit = ((body[pd_idx] == rem[:, None]) & in_run).any(axis=1)
    return l1_hit & ~route_spare, route_spare


def max_qr_of(body: np.ndarray, counts_incl: np.ndarray, overflowed: np.ndarray, last_quot: np.ndarray) -> np.ndarray:
    """(last_quot << 8 | last retained rem) per PD; -1 where not overflowed.

    The retained max's rem is the last byte of the full body
    (cap == 25 whenever overflowed), matching get_last_byte usage in
    cmp_qr1 (min_pd256.hpp:536-544).
    """
    out = np.full(len(body), -1, dtype=np.int64)
    if overflowed.any():
        out[overflowed] = (last_quot[overflowed] << 8) | body[overflowed, MAX_CAP - 1]
    return out


class SequentialPDModel:
    """Pure-Python single-key model of the reference insert/lookup path,
    used only in tests to cross-check the batch kernel (mirrors the
    reference's naive-vs-optimized assert pattern, SURVEY.md §5).

    Implements the swap-max protocol of new_pd_swap_short
    (min_pd256.hpp:416-447) with set semantics.
    """

    def __init__(self, num_pd: int):
        self.num_pd = num_pd
        self.pds: list[list[int]] = [[] for _ in range(num_pd)]  # sorted qr lists
        self.overflowed = [False] * num_pd
        self.spare: set[tuple[int, int]] = set()

    def add(self, pd: int, qr: int) -> None:
        import bisect

        items = self.pds[pd]
        i = bisect.bisect_left(items, qr)
        if i < len(items) and items[i] == qr:
            return  # set semantics
        if (pd, qr) in self.spare:
            return
        if len(items) < MAX_CAP:
            items.insert(i, qr)
            return
        self.overflowed[pd] = True
        cur_max = items[-1]
        if qr > cur_max:
            self.spare.add((pd, qr))
        else:
            items.pop()
            items.insert(i, qr)
            self.spare.add((pd, cur_max))

    def contains(self, pd: int, qr: int) -> bool:
        items = self.pds[pd]
        if self.overflowed[pd] and qr > items[-1]:
            return (pd, qr) in self.spare
        return qr in items

    def last_quot(self, pd: int) -> int:
        return (self.pds[pd][-1] >> 8) if self.overflowed[pd] else 0
