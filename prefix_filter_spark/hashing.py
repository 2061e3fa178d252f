"""Vectorized (NumPy, uint64) hashing primitives.

The reference seeds a per-instance random multiply-shift hash
(``/root/reference/hashutil.h:36-95``). Per SURVEY.md §7 we replace that
with *explicitly seeded* hashing so that shards built on different
executors agree and merges are deterministic:

- the 64-bit base key hash ``h`` is computed JVM-side with Spark's
  ``xxhash64(key, seed)`` (so shard routing can stay in Catalyst
  expressions, no Python in the shuffle path);
- all further derivation (pocket-dictionary index, quotient/remainder,
  Bloom probe positions, HLL register/rank) happens in NumPy on the
  uint64 view of that column, via splitmix64 remixing and Lemire
  fastrange (``/root/reference/Tests/wrappers.hpp:636-645``).

All functions operate on ``np.uint64`` arrays with wrap-around
arithmetic (numpy semantics match C uint64).
"""

from __future__ import annotations

import numpy as np

# splitmix64 constants (Steele et al., public domain; same mixer family as
# the reference's TwoIndependentMultiplyShift multiply-add-shift).
_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def as_u64(a) -> np.ndarray:
    """Reinterpret an int64/uint64 array-like as uint64 (no copy if possible)."""
    arr = np.asarray(a)
    if arr.dtype == np.uint64:
        return arr
    if arr.dtype == np.int64:
        return arr.view(np.uint64)
    return arr.astype(np.int64).view(np.uint64)


def splitmix64(x) -> np.ndarray:
    """Vectorized splitmix64 finalizer: uint64 -> well-mixed uint64.

    In-place ops on two buffers (one output, one shift temp): ~6 memory
    passes instead of ~12 — this mixer sits on every build/probe hot
    path, so allocation churn matters at Arrow-batch scale.
    """
    old = np.seterr(over="ignore")
    try:
        z = as_u64(x) + _SM_GAMMA  # one fresh output buffer
        if z.ndim == 0:
            z = (z ^ (z >> np.uint64(30))) * _SM_M1
            z = (z ^ (z >> np.uint64(27))) * _SM_M2
            return z ^ (z >> np.uint64(31))
        t = np.empty_like(z)
        np.right_shift(z, np.uint64(30), out=t)
        z ^= t
        z *= _SM_M1
        np.right_shift(z, np.uint64(27), out=t)
        z ^= t
        z *= _SM_M2
        np.right_shift(z, np.uint64(31), out=t)
        z ^= t
        return z
    finally:
        np.seterr(**old)


def mix_with_seed(x, seed: int) -> np.ndarray:
    """Seeded remix: splitmix64(x ^ splitmix64(seed))."""
    s = splitmix64(np.uint64(seed & 0xFFFFFFFFFFFFFFFF))
    return splitmix64(as_u64(x) ^ s)


def fastrange32(h32, n: int) -> np.ndarray:
    """Lemire fast-range: map a 32-bit value to [0, n).

    Mirrors ``reduce32`` at ``/root/reference/Tests/wrappers.hpp:636-639``:
    ``(h * n) >> 32`` in 64-bit arithmetic.
    """
    old = np.seterr(over="ignore")
    try:
        return (as_u64(h32) * np.uint64(n)) >> np.uint64(32)
    finally:
        np.seterr(**old)


def fixed_reduce(h, space: int = 6400) -> np.ndarray:
    """Map the low 16 bits of ``h`` to [0, space).

    Mirrors ``fixed_reduce`` at ``/root/reference/Tests/wrappers.hpp:642-645``
    (space = 25 quotients x 256 remainders = 6400).
    """
    old = np.seterr(over="ignore")
    try:
        return ((as_u64(h) & np.uint64(0xFFFF)) * np.uint64(space)) >> np.uint64(16)
    finally:
        np.seterr(**old)


def shard_of(h, num_shards: int) -> np.ndarray:
    """Shard id from the top 32 bits of the base hash (fastrange).

    MUST stay arithmetic-identical to the Catalyst expression built in
    ``plans.sharding.shard_col`` — shard routing happens JVM-side on
    build and NumPy-side on probe.
    """
    return fastrange32(as_u64(h) >> np.uint64(32), num_shards)


def bit_length_u64(z) -> np.ndarray:
    """Vectorized bit_length for uint64 (0 -> 0). ~6 branch-free steps."""
    z = as_u64(z).copy()
    out = np.zeros(z.shape, dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        s = np.uint64(shift)
        big = z >= (np.uint64(1) << s)
        out[big] += shift
        z[big] >>= s
    out[z > 0] += 1
    return out
