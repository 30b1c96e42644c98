"""Voxel-key packing: (kx, ky, kz) int32 triples <-> two uint32 words.

Integer voxel keys (floor(world/resolution), reference 3d_mapper.py:63-66)
are packed into a 60-bit code split over two uint32s so that

  * lexicographic order of (hi, lo) equals lexicographic order of the
    biased (kx, ky, kz) triple — a two-key ``jax.lax.sort`` groups equal
    voxels (the per-frame dedup in ops/dedup.py), and
  * per-key table ops touch 2 scalar words instead of 3-wide rows
    (row scatters measured ~6x the cost of scalar scatters on TPU).

Each axis gets 20 bits, biased by 2^19: representable keys are
[-2^19, 2^19 - 1] per axis — ±26 km of world extent at 5 cm resolution.
Keys outside that range are reported so callers can poison the frame
(the reference's dict has no such limit; in practice survey extents are
hundreds of meters).

The all-ones ``hi`` word is reserved: EMPTY_HI marks empty table slots and
invalid candidates (it sorts after every valid key).  A valid key cannot
produce it because hi's low 12 bits come from y's HIGH bits only when x's
20 bits are also all-ones — excluded by capping the valid x range at
2^19 - 2 (one voxel at the far corner of a 52 km cube).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

AXIS_BITS = 20
_BIAS = 1 << (AXIS_BITS - 1)          # 2^19
_AXIS_MAX = (1 << AXIS_BITS) - 1       # biased upper bound (inclusive)

EMPTY_HI = jnp.uint32(0xFFFFFFFF)

# hi = x20 << 12 | y20 >> 8      (x's 20 bits, y's high 12 bits)
# lo = (y20 & 0xFF) << 20 | z20  (y's low 8 bits, z's 20 bits; bits 28-31 zero)


def pack_keys(keys: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(N, 3) int32 voxel keys -> (hi (N,), lo (N,), in_range (N,)) uint32/bool.

    Out-of-range keys still produce a (meaningless) code; callers must mask
    with ``in_range``.
    """
    b = keys + jnp.int32(_BIAS)
    in_range = jnp.all((b >= 0) & (b <= _AXIS_MAX), axis=-1)
    # exclude the single all-ones-x corner so hi == EMPTY_HI is unreachable
    in_range = in_range & (b[..., 0] < _AXIS_MAX)
    x, y, z = b[..., 0].astype(jnp.uint32), b[..., 1].astype(jnp.uint32), b[..., 2].astype(jnp.uint32)
    hi = (x << 12) | (y >> 8)
    lo = ((y & jnp.uint32(0xFF)) << 20) | z
    return hi, lo, in_range


def unpack_keys(hi: jnp.ndarray, lo: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pack_keys -> (N, 3) int32 (undefined for EMPTY_HI)."""
    x = (hi >> 12).astype(jnp.int32)
    y = (((hi & jnp.uint32(0xFFF)) << 8) | (lo >> 20)).astype(jnp.int32)
    z = (lo & jnp.uint32(0xFFFFF)).astype(jnp.int32)
    return jnp.stack([x, y, z], axis=-1) - jnp.int32(_BIAS)


def mix2(hi: jnp.ndarray, lo: jnp.ndarray) -> jnp.ndarray:
    """32-bit avalanche of the packed key (murmur3 finalizer over a simple
    combine) — uniform bucket index bits for spatially clustered keys."""
    h = hi * jnp.uint32(0x9E3779B1) ^ lo * jnp.uint32(0x85EBCA6B)
    h = (h ^ (h >> 16)) * jnp.uint32(0x85EBCA6B)
    h = (h ^ (h >> 13)) * jnp.uint32(0xC2B2AE35)
    return h ^ (h >> 16)
