"""Randomized property tests for the sort-dedup and bucket-insert primitives
against straightforward NumPy reference computations."""

import numpy as np
import jax.numpy as jnp

from sonar_3d_reconstruction_tpu.grid.hash import (
    BUCKET_SLOTS,
    bucket_lookup,
    init_hash_grid,
    insert_unique,
)
from sonar_3d_reconstruction_tpu.ops.dedup import dedup_frame
from sonar_3d_reconstruction_tpu.ops.packing import EMPTY_HI, pack_keys, unpack_keys


def naive_dedup(keys, occ, valid):
    agg = {}
    for k, o, v in zip(map(tuple, keys), occ, valid):
        if not v:
            continue
        c, no = agg.get(k, (0, 0))
        agg[k] = (c + 1, no + int(o))
    return agg


def test_dedup_frame_random_property():
    rng = np.random.default_rng(7)
    for trial in range(8):
        n = int(rng.integers(10, 3000))
        spread = int(rng.integers(2, 12))
        keys = rng.integers(-spread, spread, (n, 3)).astype(np.int32)
        occ = rng.random(n) < 0.4
        valid = rng.random(n) < 0.8
        hi, lo, _ = pack_keys(jnp.asarray(keys))
        budget = 1 << int(np.ceil(np.log2(max(8, n))))
        rec = dedup_frame(
            hi, lo, jnp.asarray(occ), jnp.asarray(valid), budget
        )
        expect = naive_dedup(keys, occ, valid)
        assert int(rec.n_unique) == len(expect), trial
        uk = np.asarray(unpack_keys(rec.hi, rec.lo))
        rvalid = np.asarray(rec.valid)
        rcount = np.asarray(rec.count)
        rocc = np.asarray(rec.n_occ)
        got = {}
        for i in range(budget):
            if rvalid[i]:
                got[tuple(uk[i])] = (int(rcount[i]), int(rocc[i]))
        assert got == expect, trial


def test_bucket_insert_random_property():
    """Random unique key sets: every key inserted exactly once, findable,
    distinct slots, bucket prefix-fill invariant maintained."""
    rng = np.random.default_rng(11)
    ran = 0
    for trial in range(6):
        capacity = 1 << int(rng.integers(7, 13))
        n = int(rng.integers(1, max(2, capacity // 8)))
        keys = rng.choice(10000, size=n, replace=False)
        keys = np.stack([keys % 21 - 10, (keys // 21) % 23 - 11,
                         keys // (21 * 23)], axis=-1).astype(np.int32)
        hi, lo, _ = pack_keys(jnp.asarray(keys))
        state = init_hash_grid(capacity)
        bucket, found, _, fill = bucket_lookup(state.key_rows, hi, lo)
        assert not bool(found.any())
        key_rows, slots, ovf, n_ins = insert_unique(
            state.key_rows, hi, lo, jnp.ones(n, bool), bucket, fill
        )
        if bool(ovf):
            continue  # legitimately full bucket at high load
        ran += 1
        slots = np.asarray(slots)
        assert int(n_ins) == n
        assert len(set(slots.tolist())) == n
        # findable afterwards at the same slots
        _, found2, found_slot2, _ = bucket_lookup(key_rows, hi, lo)
        assert bool(found2.all())
        np.testing.assert_array_equal(np.asarray(found_slot2), slots)
        # prefix-fill invariant: within each bucket, occupied slots form a
        # prefix
        rows = np.asarray(key_rows)[:, :BUCKET_SLOTS] != np.uint32(EMPTY_HI)
        for r in rows:
            k = int(r.sum())
            assert r[:k].all() and not r[k:].any()
    assert ran >= 4, "too many trials skipped on overflow — check insert_unique"


def test_incremental_inserts_preserve_invariants():
    """Multiple insert waves (as happens across frames) keep lookup exact."""
    rng = np.random.default_rng(13)
    capacity = 1 << 10
    state = init_hash_grid(capacity)
    key_rows = state.key_rows
    all_keys = {}
    for wave in range(5):
        n = 40
        keys = rng.integers(-40, 40, (n, 3)).astype(np.int32)
        hi, lo, _ = pack_keys(jnp.asarray(keys))
        bucket, found, found_slot, fill = bucket_lookup(key_rows, hi, lo)
        found_np = np.asarray(found)
        found_slot_np = np.asarray(found_slot)
        # previously inserted keys must be found at their original slots
        for i, k in enumerate(map(tuple, keys)):
            if k in all_keys:
                assert found_np[i], (wave, k)
                assert int(found_slot_np[i]) == all_keys[k]
        # dedup within the wave (insert_unique expects mutually distinct)
        seen = set()
        need = []
        for i, k in enumerate(map(tuple, keys)):
            fresh = k not in all_keys and k not in seen
            need.append(fresh)
            if fresh:
                seen.add(k)
        key_rows, slots, ovf, n_ins = insert_unique(
            key_rows, hi, lo, jnp.asarray(need), bucket, fill
        )
        assert not bool(ovf)
        slots = np.asarray(slots)
        for i, k in enumerate(map(tuple, keys)):
            if need[i]:
                all_keys[k] = int(slots[i])


def test_dedup_frame_compact_random_property():
    """dedup_frame_compact over box-relative u32 keys produces the same
    aggregates as the naive dict (and hence as dedup_frame)."""
    from sonar_3d_reconstruction_tpu.ops.dedup import dedup_frame_compact
    from sonar_3d_reconstruction_tpu.ops.packing import (
        EMPTY32, pack_box_keys, unpack_box_brick,
    )

    rng = np.random.default_rng(11)
    brick_bits = 2
    box_bits = (4, 4, 4)
    for trial in range(8):
        n = int(rng.integers(10, 3000))
        spread = int(rng.integers(2, 12))
        keys = rng.integers(-spread, spread, (n, 3)).astype(np.int32)
        occ = rng.random(n) < 0.4
        valid = rng.random(n) < 0.8
        box_min = np.asarray([-16, -16, -16], np.int32)  # brick-aligned
        bkey, in_box = pack_box_keys(
            jnp.asarray(keys), jnp.asarray(box_min), box_bits, brick_bits
        )
        assert bool(jnp.all(in_box)), "spread exceeds test box"
        budget = 1 << int(np.ceil(np.log2(max(8, n))))
        rec = dedup_frame_compact(
            bkey, jnp.asarray(occ), jnp.asarray(valid), budget
        )
        expect = naive_dedup(keys, occ, valid)
        assert int(rec.n_unique) == len(expect), trial
        # decode: brick corner + offset from the box key
        rkey = np.asarray(rec.key)
        rvalid = np.asarray(rec.valid)
        o = 3 * brick_bits
        corner = np.asarray(unpack_box_brick(
            jnp.asarray(rkey >> o), jnp.asarray(box_min), box_bits,
            brick_bits,
        ))
        offc = rkey & ((1 << o) - 1)
        b = 1 << brick_bits
        offs = np.stack(
            [offc >> (2 * brick_bits), (offc >> brick_bits) & (b - 1),
             offc & (b - 1)], axis=-1,
        ).astype(np.int32)
        uk = corner + offs
        got = {}
        for i in range(budget):
            if rvalid[i]:
                got[tuple(uk[i])] = (
                    int(np.asarray(rec.count)[i]),
                    int(np.asarray(rec.n_occ)[i]),
                )
        assert got == expect, trial


def test_pack_box_keys_bounds_and_order():
    """in_box gating is exact at the box faces and key order is
    (brick, offset) lexicographic-compatible (equal voxels <=> equal keys)."""
    from sonar_3d_reconstruction_tpu.ops.packing import pack_box_keys

    brick_bits = 2
    box_bits = (2, 3, 2)  # 4 x 8 x 4 bricks = 16 x 32 x 16 voxels
    box_min = np.asarray([-8, 4, 0], np.int32)
    size = np.asarray([16, 32, 16])
    lo = box_min
    hi = box_min + size - 1
    probes = np.array([
        lo, hi, lo - 1, hi + 1,
        [lo[0], lo[1], hi[2] + 1],
        [hi[0] + 1, lo[1], lo[2]],
        [lo[0], hi[1] + 1, lo[2]],
    ], np.int32)
    key, in_box = pack_box_keys(
        jnp.asarray(probes), jnp.asarray(box_min), box_bits, brick_bits
    )
    assert list(np.asarray(in_box)) == [
        True, True, False, False, False, False, False
    ]
    # bijectivity over the whole box
    xs = np.arange(size[0])
    grid = np.stack(np.meshgrid(
        xs + box_min[0], np.arange(size[1]) + box_min[1],
        np.arange(size[2]) + box_min[2], indexing="ij",
    ), -1).reshape(-1, 3).astype(np.int32)
    k, ib = pack_box_keys(
        jnp.asarray(grid), jnp.asarray(box_min), box_bits, brick_bits
    )
    assert bool(jnp.all(ib))
    assert len(np.unique(np.asarray(k))) == len(grid)


def test_dedup_frame_compact_grouped_random_property():
    """dedup_frame_compact_grouped: same aggregates as the naive dict,
    records CONTIGUOUS per group with correct rec_group, group folded
    into the single sort word."""
    from sonar_3d_reconstruction_tpu.ops.dedup import (
        dedup_frame_compact_grouped,
    )
    from sonar_3d_reconstruction_tpu.ops.packing import (
        pack_box_keys,
        unpack_box_brick,
    )

    rng = np.random.default_rng(29)
    brick_bits = 2
    box_bits = (4, 4, 4)
    key_bits = sum(box_bits) + 3 * brick_bits
    for trial in range(8):
        n = int(rng.integers(10, 3000))
        spread = int(rng.integers(2, 12))
        G = int(rng.integers(2, 9))
        keys = rng.integers(-spread, spread, (n, 3)).astype(np.int32)
        occ = rng.random(n) < 0.4
        valid = rng.random(n) < 0.8
        box_min = np.asarray([-16, -16, -16], np.int32)
        bkey, in_box = pack_box_keys(
            jnp.asarray(keys), jnp.asarray(box_min), box_bits, brick_bits
        )
        assert bool(jnp.all(in_box))
        group = (np.asarray(bkey).astype(np.uint64) * 2654435761 % G).astype(
            np.int32
        )
        budget = 1 << int(np.ceil(np.log2(max(8, n))))
        rec, rec_group = dedup_frame_compact_grouped(
            bkey, jnp.asarray(occ), jnp.asarray(valid), jnp.asarray(group),
            G, key_bits, budget,
        )
        expect = naive_dedup(keys, occ, valid)
        assert int(rec.n_unique) == len(expect), trial
        assert not bool(rec.pack_fail)

        rkey = np.asarray(rec.key)
        rvalid = np.asarray(rec.valid)
        rgroup = np.asarray(rec_group)
        o = 3 * brick_bits
        corner = np.asarray(
            unpack_box_brick(
                jnp.asarray(rkey >> o), jnp.asarray(box_min), box_bits,
                brick_bits,
            )
        )
        offc = rkey & ((1 << o) - 1)
        b = 1 << brick_bits
        offs = np.stack(
            [offc >> (2 * brick_bits), (offc >> brick_bits) & (b - 1),
             offc & (b - 1)], axis=-1,
        ).astype(np.int32)
        uk = corner + offs
        got = {}
        prev = None
        counts = np.asarray(rec.count)
        noccs = np.asarray(rec.n_occ)
        for i in range(budget):
            if not rvalid[i]:
                assert rgroup[i] == G
                continue
            got[tuple(uk[i])] = (int(counts[i]), int(noccs[i]))
            assert rgroup[i] == int(rkey[i] * np.uint64(2654435761) % G), i
            cur = (rgroup[i], int(rkey[i]))
            if prev is not None:
                assert cur > prev, (trial, i)  # per-group contiguity
            prev = cur
        assert got == expect, trial


def test_dedup_frame_compact_pack_fail_detection():
    """A voxel with 2^16+ candidates in one frame must assert pack_fail
    (its count cannot ride the 16-bit payload field); 2^16 - 1 candidates
    must NOT, and their count must come through exactly — the mod-2^16
    adjacent-difference boundary case."""
    from sonar_3d_reconstruction_tpu.ops.dedup import dedup_frame_compact

    n = 70000
    key = jnp.full((n,), 5, jnp.uint32)
    occ = (jnp.arange(n) % 3) == 0
    valid = jnp.ones((n,), bool)

    rec = dedup_frame_compact(key, occ, valid, 128, lane_budget=n)
    assert bool(rec.pack_fail)
    assert int(rec.n_unique) == 1

    # exactly 65535 valid candidates: representable, exact
    valid2 = jnp.arange(n) < 0xFFFF
    rec2 = dedup_frame_compact(key, occ, valid2, 128, lane_budget=n)
    assert not bool(rec2.pack_fail)
    assert int(rec2.n_unique) == 1
    assert int(np.asarray(rec2.count)[0]) == 0xFFFF
    assert int(np.asarray(rec2.n_occ)[0]) == int(np.sum(np.asarray(occ)[:0xFFFF]))

    # 65536 valid candidates on one voxel: the first unrepresentable count
    valid3 = jnp.arange(n) < 0x10000
    rec3 = dedup_frame_compact(key, occ, valid3, 128, lane_budget=n)
    assert bool(rec3.pack_fail)


def test_dedup_frame_grouped_random_property():
    """dedup_frame_grouped: same aggregates as the naive dict, records
    CONTIGUOUS per group and key-sorted within, rec_group correct."""
    from sonar_3d_reconstruction_tpu.ops.dedup import dedup_frame_grouped

    rng = np.random.default_rng(23)
    for trial in range(8):
        n = int(rng.integers(10, 3000))
        spread = int(rng.integers(2, 12))
        G = int(rng.integers(2, 9))
        keys = rng.integers(-spread, spread, (n, 3)).astype(np.int32)
        occ = rng.random(n) < 0.4
        valid = rng.random(n) < 0.8
        hi, lo, _ = pack_keys(jnp.asarray(keys))
        # group must be a pure function of the key
        group = jnp.asarray(
            (np.asarray(hi, np.uint64) * 2654435761 + np.asarray(lo))
            % G
        ).astype(jnp.int32)
        budget = 1 << int(np.ceil(np.log2(max(8, n))))
        rec, rec_group = dedup_frame_grouped(
            hi, lo, jnp.asarray(occ), jnp.asarray(valid), group, G, budget
        )
        expect = naive_dedup(keys, occ, valid)
        assert int(rec.n_unique) == len(expect), trial
        rvalid = np.asarray(rec.valid)
        rk = np.asarray(unpack_keys(rec.hi, rec.lo))
        rgroup = np.asarray(rec_group)
        got = {}
        prev = None
        for i in range(budget):
            if not rvalid[i]:
                assert rgroup[i] == G
                continue
            k = tuple(rk[i])
            got[k] = (int(np.asarray(rec.count)[i]),
                      int(np.asarray(rec.n_occ)[i]))
            # group matches the hash of the key
            khi, klo, _ = pack_keys(jnp.asarray(np.asarray([k], np.int32)))
            gg = int((int(np.asarray(khi)[0]) * 2654435761
                      + int(np.asarray(klo)[0])) % G)
            assert rgroup[i] == gg, (trial, i)
            # (group, key) nondecreasing => per-group contiguity
            cur = (rgroup[i], int(np.asarray(rec.hi)[i]),
                   int(np.asarray(rec.lo)[i]))
            if prev is not None:
                assert cur > prev, (trial, i)
            prev = cur
        assert got == expect, trial
