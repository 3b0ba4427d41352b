"""RNG helpers."""

from __future__ import annotations

import zlib

import jax


def fold_in_name(key: jax.Array, name: str) -> jax.Array:
    """Derive a named PRNG stream with a PROCESS-STABLE hash.

    Python's built-in ``hash(str)`` is salted per interpreter (PYTHONHASHSEED),
    which would make a fixed --seed unreproducible across runs and break
    checkpoint resume determinism; crc32 is stable everywhere.
    """
    return jax.random.fold_in(key, zlib.crc32(name.encode()) & 0x7FFFFFFF)
