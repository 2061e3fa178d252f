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
    p: int = 14  # 16384 registers, ~0.81% rel. std error
    seed: int = 42

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
        return (
            _HDR.pack(_MAGIC, _VERSION, self.cfg.p, 0, self.cfg.seed & _SEED_MASK)
            + self.registers.tobytes()
        )


def _parse_state(state: bytes) -> tuple[int, np.ndarray]:
    magic, version, p, _, _seed = _HDR.unpack_from(state, 0)
    if magic != _MAGIC or version != _VERSION:
        raise ValueError("bad hll state")
    return p, np.frombuffer(state, dtype=np.uint8, offset=_HDR.size)


def merge_states(states: list[bytes]) -> bytes:
    hdr = states[0][: _HDR.size]
    if any(s[: _HDR.size] != hdr for s in states[1:]):
        raise ValueError("cannot merge HLLs with different p or seed")
    parsed = [_parse_state(s) for s in states]
    regs = reduce(np.maximum, (r for _, r in parsed))
    return hdr + regs.tobytes()


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
