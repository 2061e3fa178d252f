"""Sharded classic Bloom filter as a mergeable aggregate.

Semantics follow the reference's ``bloomfilter::BloomFilter``
(``/root/reference/Bloom_Filter/bloom.hpp:77-256``): k = round(bpi*ln2)
probe bits per key (``bloom.hpp:71-79``), double hashing ``a += b``
between probes (``bloom.hpp:140-154``). Re-expressed batch-vectorized:
the per-key ``Add`` loop becomes one NumPy scatter per shard, and the
cache-blocked ``AddAll`` locality trick (``bloom.hpp:156-205``) becomes
the shard shuffle itself — all keys of a shard land on one executor.

Merge of same-shard states = bitwise OR (associative, commutative,
idempotent) — building from partitioned subsets then OR-merging is
bit-identical to a single-pass build, which is the north rule's merge
associativity requirement.

State layout (little-endian):
    magic 'PFSB' | u8 version | u8 k | u16 pad | u64 m_bits | bit array
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass
from functools import reduce

import numpy as np
from pyspark.sql import DataFrame

from prefix_filter_spark.hashing import as_u64, mix_with_seed, shard_of
from prefix_filter_spark.sketches import base

_MAGIC = b"PFSB"
_VERSION = 2
# magic | ver | k | pad | m_bits u64 | seed u64 | num_shards u32 — seed
# and shard count are serialized so probe/merge boundaries can reject a
# state/config mismatch loudly (a wrong seed is silent false negatives)
_HDR = struct.Struct("<4sBBHQQI")
_SEED_MASK = 0xFFFFFFFFFFFFFFFF


@dataclass(frozen=True)
class BloomConfig:
    """Sizing mirrors ConstructFromAddCount (/root/reference/Tests/
    wrappers.hpp:831-833): capacity declared up front, bits = n * bpi."""

    n_capacity: int
    bits_per_key: int = 12
    num_shards: int = 32
    seed: int = 42

    @property
    def k(self) -> int:
        # bloom.hpp:71-79 — optimal k = bpi * ln 2, floored at 1
        return max(1, round(self.bits_per_key * math.log(2)))

    @property
    def m_bits_per_shard(self) -> int:
        per_shard_keys = math.ceil(self.n_capacity / self.num_shards)
        m = per_shard_keys * self.bits_per_key
        return max(64, (m + 63) // 64 * 64)  # whole words

    def theoretical_fpr(self) -> float:
        n = self.n_capacity / self.num_shards
        m = self.m_bits_per_shard
        k = self.k
        return (1.0 - math.exp(-k * n / m)) ** k


def _probe_positions(g: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """(n, k) bit positions via double hashing a += b (bloom.hpp:140-154)."""
    old = np.seterr(over="ignore")
    try:
        a = g >> np.uint64(32)
        b = g & np.uint64(0xFFFFFFFF)
        i = np.arange(k, dtype=np.uint64)
        # (n, k) = a + i*b, then fastrange32 into [0, m_bits)
        mix = a[:, None] + i[None, :] * b[:, None]
        mix &= np.uint64(0xFFFFFFFF)
        return ((mix * np.uint64(m_bits)) >> np.uint64(32)).astype(np.int64)
    finally:
        np.seterr(**old)


def _build_state(cfg: BloomConfig, hashes_u64: np.ndarray) -> bytes:
    m = cfg.m_bits_per_shard
    g = mix_with_seed(hashes_u64, cfg.seed + 0x5EED)
    bits = np.zeros(m, dtype=bool)
    if len(g):
        pos = _probe_positions(g, cfg.k, m)
        bits[pos.ravel()] = True
    packed = np.packbits(bits, bitorder="little")
    return (
        _HDR.pack(
            _MAGIC, _VERSION, cfg.k, 0, m, cfg.seed & _SEED_MASK, cfg.num_shards
        )
        + packed.tobytes()
    )


def _parse_state(state: bytes) -> tuple[int, int, np.ndarray]:
    magic, version, k, _, m, _seed, _ns = _HDR.unpack_from(state, 0)
    if magic != _MAGIC or version != _VERSION:
        raise ValueError("bad bloom state header")
    arr = np.frombuffer(state, dtype=np.uint8, offset=_HDR.size)
    return k, m, arr


def check_state(cfg: BloomConfig, state: bytes) -> None:
    """Reject a state/config mismatch before probing mis-derives bit
    positions (silent false negatives) — header-only, no body parse."""
    magic, version, k, _, m, seed, ns = _HDR.unpack_from(state, 0)
    if magic != _MAGIC or version != _VERSION:
        raise ValueError("bad bloom state header")
    if (
        k != cfg.k
        or m != cfg.m_bits_per_shard
        or seed != (cfg.seed & _SEED_MASK)
        or ns != cfg.num_shards
    ):
        raise ValueError(
            f"bloom state (k={k}, m={m}, seed={seed}, num_shards={ns}) does "
            f"not match config (k={cfg.k}, m={cfg.m_bits_per_shard}, "
            f"seed={cfg.seed & _SEED_MASK}, num_shards={cfg.num_shards})"
        )


def _contains_in_state(state: bytes, g: np.ndarray) -> np.ndarray:
    k, m, packed = _parse_state(state)
    if len(g) == 0:
        return np.zeros(0, dtype=bool)
    pos = _probe_positions(g, k, m)
    byte_idx = pos >> 3
    bit = np.uint8(1) << (pos & 7).astype(np.uint8)
    hit = (packed[byte_idx] & bit) != 0
    return hit.all(axis=1)


def merge_states(states: list[bytes]) -> bytes:
    """OR-merge same-shard partials (bloom.hpp AddAll over subsets).
    The full header (incl. seed + shard count) must agree byte-for-byte."""
    hdr = states[0][: _HDR.size]
    if any(s[: _HDR.size] != hdr for s in states[1:]):
        raise ValueError("cannot merge bloom states with different configs")
    parsed = [_parse_state(s) for s in states]
    merged = reduce(np.bitwise_or, (p[2] for p in parsed[1:]), parsed[0][2])
    return hdr + merged.tobytes()


def build_bloom(df: DataFrame, key_col, cfg: BloomConfig) -> DataFrame:
    """df[key_col] -> shard-row DataFrame (one shuffle, vectorized build)."""
    return base.build_sharded(
        df,
        key_col,
        sketch_name=f"bloom{cfg.bits_per_key}",
        seed=cfg.seed,
        num_shards=cfg.num_shards,
        state_fn=lambda shard_id, hashes: _build_state(cfg, hashes),
    )


class ShardedBloom:
    """Driver-side probe handle over collected shard states.

    ``contains_h`` takes the xxhash64 column values (int64) — the same
    base hash used at build time — and is fully vectorized; it is what
    the registered SQL UDF calls (see functions.py).
    """

    def __init__(self, cfg: BloomConfig, states: dict[int, bytes]):
        self.cfg = cfg
        self.states = states

    @classmethod
    def from_df(cls, cfg: BloomConfig, shards_df: DataFrame) -> "ShardedBloom":
        return cls(cfg, base.collect_states(shards_df))

    def byte_size(self) -> int:
        # FilterAPI::get_byte_size (/root/reference/Tests/wrappers.hpp:766-772)
        return sum(len(s) for s in self.states.values())

    def contains_h(self, h) -> np.ndarray:
        h = as_u64(np.asarray(h))
        out = np.zeros(len(h), dtype=bool)
        if len(h) == 0:
            return out
        shards = shard_of(h, self.cfg.num_shards).astype(np.int64)
        g = mix_with_seed(h, self.cfg.seed + 0x5EED)
        order = np.argsort(shards, kind="stable")
        sorted_shards = shards[order]
        bounds = np.searchsorted(sorted_shards, np.arange(self.cfg.num_shards + 1))
        for sid in np.unique(sorted_shards):
            lo, hi = bounds[sid], bounds[sid + 1]
            idx = order[lo:hi]
            state = self.states.get(int(sid))
            if state is not None:
                check_state(self.cfg, state)
                out[idx] = _contains_in_state(state, g[idx])
        return out


def contains_h_in_state(state: bytes, h) -> np.ndarray:
    """Probe base-hash values against ONE serialized state, reading the
    seed from the state header — the state-COLUMN path (SQL UDF over a
    table of states, e.g. the per-file index), where no driver handle
    exists to carry the config."""
    _magic, _ver, _k, _, _m, seed, _ns = _HDR.unpack_from(state, 0)
    g = mix_with_seed(as_u64(np.asarray(h)), seed + 0x5EED)
    return _contains_in_state(state, g)
