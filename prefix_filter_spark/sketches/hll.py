"""HyperLogLog (dense) as a mergeable aggregate.

North-rule extension (SURVEY.md §2.4) — no reference implementation;
semantics per Flajolet et al. 2007 / HLL++ (Heule et al. 2013), the same
family as Spark's built-in ``approx_count_distinct`` (our oracle).

State: magic 'PFSH' | u8 ver | u8 p | u16 pad | registers u8[2^p].
Merge = elementwise max (associative, commutative, idempotent).
Error: +-1.04/sqrt(m) relative std at large n; linear counting below.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass
from functools import reduce

import numpy as np
from pyspark.sql import DataFrame

from prefix_filter_spark.hashing import as_u64, mix_with_seed
from prefix_filter_spark.sketches import base

_MAGIC = b"PFSH"
_VERSION = 2
# magic | ver | p | pad | seed u64 — the seed is serialized so merging
# registers produced under a different hash mix fails loudly instead of
# silently corrupting the estimate
_HDR = struct.Struct("<4sBBHQ")
_SEED_MASK = 0xFFFFFFFFFFFFFFFF


@dataclass(frozen=True)
class HllConfig:
    """``sparse=True`` (opt-in) serializes states whose nonzero-register
    count is below m/4 as sorted (idx, rank) entries (~3.25 B/entry)
    instead of the dense m-byte array — the per-GROUP memory fix at
    scale: a million per-source HLLs at p=14 cost 16 GB dense but only
    ~n_distinct*3 B sparse while a group is small, with AUTOMATIC dense
    promotion (the format is per-state, chosen at serialize time).
    Register CONTENT is identical either way, so estimates, merges
    (mixed formats welcome) and the dense default's byte layout are
    all unchanged."""

    p: int = 14  # 16384 registers, ~0.81% rel. std error
    seed: int = 42
    sparse: bool = False

    def __post_init__(self):
        if not 4 <= self.p <= 24:
            # the sparse u32 entry packs idx << 8 | rank — a register
            # index needs <= 24 bits, and p > 24 (16M+ registers) is
            # past any useful accuracy/size tradeoff anyway
            raise ValueError(f"HllConfig.p must be in [4, 24], got {self.p}")

    @property
    def m(self) -> int:
        return 1 << self.p

    def rel_error(self) -> float:
        return 1.04 / math.sqrt(self.m)


class HllAccumulator(base.Accumulator):
    def __init__(self, cfg: HllConfig):
        self.cfg = cfg
        self.registers = np.zeros(cfg.m, dtype=np.uint8)

    def update(self, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        g = mix_with_seed(as_u64(values), self.cfg.seed + 0x4117)
        p = self.cfg.p
        idx = (g & np.uint64(self.cfg.m - 1)).astype(np.int64)
        w = g >> np.uint64(p)
        # w < 2^(64-p) <= 2^52: float64 is exact, frexp gives bit_length
        # in one vectorized pass (vs 6-step shift loop)
        _, exp = np.frexp(w.astype(np.float64))
        rho = ((64 - p) - exp + 1).astype(np.uint8)  # w==0 -> exp 0 -> 64-p+1
        np.maximum.at(self.registers, idx, rho)

    def to_bytes(self) -> bytes:
        return _serialize(
            self.cfg.p, self.cfg.seed, self.registers, sparse=self.cfg.sparse
        )


# pad field doubles as the format tag: 0 = dense register array,
# 1 = sparse sorted u32 entries (idx << 8 | rank)
_FMT_DENSE, _FMT_SPARSE = 0, 1


def _serialize(p: int, seed: int, regs: np.ndarray, *, sparse: bool) -> bytes:
    m = 1 << p
    nnz = int((regs != 0).sum())
    if sparse and nnz < m // 4:
        idx = np.flatnonzero(regs).astype(np.uint32)
        entries = (idx << np.uint32(8)) | regs[idx].astype(np.uint32)
        return (
            _HDR.pack(_MAGIC, _VERSION, p, _FMT_SPARSE, seed & _SEED_MASK)
            + entries.tobytes()
        )
    return _HDR.pack(_MAGIC, _VERSION, p, _FMT_DENSE, seed & _SEED_MASK) + regs.tobytes()


def _parse_state(state: bytes) -> tuple[int, np.ndarray]:
    magic, version, p, fmt, _seed = _HDR.unpack_from(state, 0)
    if magic != _MAGIC or version != _VERSION:
        raise ValueError("bad hll state")
    if fmt == _FMT_SPARSE:
        entries = np.frombuffer(state, dtype=np.uint32, offset=_HDR.size)
        regs = np.zeros(1 << p, dtype=np.uint8)
        regs[(entries >> np.uint32(8)).astype(np.int64)] = (
            entries & np.uint32(0xFF)
        ).astype(np.uint8)
        return p, regs
    return p, np.frombuffer(state, dtype=np.uint8, offset=_HDR.size)


def merge_states(states: list[bytes]) -> bytes:
    metas = [_HDR.unpack_from(s, 0) for s in states]
    if any(
        (m[0], m[1], m[2], m[4]) != (metas[0][0], metas[0][1], metas[0][2], metas[0][4])
        for m in metas[1:]
    ):
        raise ValueError("cannot merge HLLs with different p or seed")
    parsed = [_parse_state(s) for s in states]
    regs = reduce(np.maximum, (r for _, r in parsed))
    p, seed = metas[0][2], metas[0][4]
    # result stays sparse only if every input chose sparse (keeps the
    # dense default's bytes unchanged and the format monotone)
    all_sparse = all(m[3] == _FMT_SPARSE for m in metas)
    return _serialize(p, seed, regs, sparse=all_sparse)


def estimate(state: bytes) -> float:
    """Raw HLL estimator with linear-counting small-range correction."""
    p, regs = _parse_state(state)
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.power(2.0, -regs.astype(np.float64)).sum()
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    return float(est)


def build_hll(df: DataFrame, value_col, cfg: HllConfig) -> DataFrame:
    partials = base.build_partials(
        df, value_col, sketch_name=f"hll{cfg.p}", acc_factory=lambda: HllAccumulator(cfg)
    )
    return base.tree_merge(partials, merge_states)


def distinct_estimate(df: DataFrame, value_col, cfg: HllConfig | None = None) -> float:
    cfg = cfg or HllConfig()
    row = build_hll(df, value_col, cfg).select("state").collect()[0]
    return estimate(bytes(row["state"]))
