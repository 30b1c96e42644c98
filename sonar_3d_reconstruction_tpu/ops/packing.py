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


# ---------------------------------------------------------------------------
# Brick-aware packing (grid/brick.py sparse-of-dense experiment).
#
# Voxel keys are split into a BRICK coordinate (key >> brick_bits per axis)
# and an in-brick OFFSET (key & (brick-1)); the packed 60-bit code orders
# fields as (bx, by, bz, offset), so
#
#   * lexicographic (hi, lo) order groups all voxels of a brick contiguously
#     (bricks appear in brick-key order, voxels in offset order within), and
#   * the BRICK identity is the code with the offset bits masked out —
#     window applies find unique bricks by neighbor compare on the masked
#     code, for free, after the sort they already do.
#
# The voxel range is the same ±2^19 cells as pack_keys (brick axes get
# 20 - brick_bits bits), except the last BRICK of the +x axis is excluded
# (vs pack_keys' last VOXEL) to keep hi == EMPTY_HI unreachable.  Total
# payload is always 3*20 = 60 bits, left-aligned: lo's LOW 4 bits are ZERO —
# window engines fold the frame index into them, getting exact
# (voxel, frame-ascending) ordering from the same two sort keys with no
# extra array (frame is the least-significant field, so it never perturbs
# voxel/brick grouping).
# ---------------------------------------------------------------------------


def brick_layout(brick_bits: int):
    """(axis_bits, off_bits, lo_by_bits) field layout for a brick packing."""
    assert 1 <= brick_bits <= 3
    a = AXIS_BITS - brick_bits        # bits per brick axis
    o = 3 * brick_bits                # offset bits
    lo_by = 28 - (o + a)              # low bits of by that land in lo
    assert 0 <= lo_by < a
    return a, o, lo_by


def pack_brick_keys(
    keys: jnp.ndarray, brick_bits: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(N, 3) int32 voxel keys -> (hi, lo, in_range) with brick-major order.

    lo bits: [31 .. o+a+4] = by low bits, [o+a+3 .. o+4] = bz,
    [o+3 .. 4] = offset (x_off << 2b | y_off << b | z_off), [3 .. 0] = ZERO
    (frame space); hi carries bx and by's high bits.  Brick identity =
    (hi, lo & ~((1 << (o + 4)) - 1)); offset = (lo >> 4) & ((1 << o) - 1).
    """
    a, o, lo_by = brick_layout(brick_bits)
    brick = 1 << brick_bits
    bias = 1 << (a - 1)
    bk = (keys >> brick_bits) + jnp.int32(bias)
    off = keys & jnp.int32(brick - 1)
    amax = (1 << a) - 1
    in_range = jnp.all((bk >= 0) & (bk <= amax), axis=-1)
    # exclude the single all-ones-bx plane so hi == EMPTY_HI is unreachable
    in_range = in_range & (bk[..., 0] < amax)
    bx = bk[..., 0].astype(jnp.uint32)
    by = bk[..., 1].astype(jnp.uint32)
    bz = bk[..., 2].astype(jnp.uint32)
    offc = (
        (off[..., 0].astype(jnp.uint32) << (2 * brick_bits))
        | (off[..., 1].astype(jnp.uint32) << brick_bits)
        | off[..., 2].astype(jnp.uint32)
    )
    hi = (bx << (o + 2 * a - 28)) | (by >> lo_by)
    lo = (
        ((by & jnp.uint32((1 << lo_by) - 1)) << (o + a + 4))
        | (bz << (o + 4))
        | (offc << 4)
    )
    return hi, lo, in_range


def unpack_brick_keys(
    hi: jnp.ndarray, lo: jnp.ndarray, brick_bits: int
) -> jnp.ndarray:
    """Inverse of pack_brick_keys -> (N, 3) int32 voxel keys (ignores the
    low 4 frame bits of lo)."""
    a, o, lo_by = brick_layout(brick_bits)
    bias = 1 << (a - 1)
    bx = (hi >> (o + 2 * a - 28)).astype(jnp.int32)
    by = (
        ((hi & jnp.uint32((1 << (a - lo_by)) - 1)) << lo_by)
        | ((lo >> (o + a + 4)) & jnp.uint32((1 << lo_by) - 1))
    ).astype(jnp.int32)
    bz = ((lo >> (o + 4)) & jnp.uint32((1 << a) - 1)).astype(jnp.int32)
    off = (lo >> 4) & jnp.uint32((1 << o) - 1)
    ox = (off >> (2 * brick_bits)).astype(jnp.int32)
    oy = ((off >> brick_bits) & ((1 << brick_bits) - 1)).astype(jnp.int32)
    oz = (off & ((1 << brick_bits) - 1)).astype(jnp.int32)
    bk = jnp.stack([bx, by, bz], axis=-1) - jnp.int32(bias)
    return (bk << brick_bits) + jnp.stack([ox, oy, oz], axis=-1)


def mix2(hi: jnp.ndarray, lo: jnp.ndarray) -> jnp.ndarray:
    """32-bit avalanche of the packed key (murmur3 finalizer over a simple
    combine) — uniform bucket index bits for spatially clustered keys."""
    h = hi * jnp.uint32(0x9E3779B1) ^ lo * jnp.uint32(0x85EBCA6B)
    h = (h ^ (h >> 16)) * jnp.uint32(0x85EBCA6B)
    h = (h ^ (h >> 13)) * jnp.uint32(0xC2B2AE35)
    return h ^ (h >> 16)
