"""Correctness of the experimental Pallas table kernel vs the XLA path
(interpret mode on CPU; the perf comparison runs on the real chip via
scripts/profile_pallas.py, results in PERFORMANCE.md)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sonar_3d_reconstruction_tpu.ops.packing import EMPTY_HI
from sonar_3d_reconstruction_tpu.pallas import (
    pallas_lookup_accumulate,
    xla_lookup_accumulate,
)

NB = 64  # 64 buckets x 128 slots = 8192-slot toy table


def _records(n_active, u, seed, n_distinct=None):
    rng = np.random.default_rng(seed)
    n_distinct = n_distinct or n_active
    pool = rng.integers(0, 1 << 48, size=n_distinct, dtype=np.uint64)
    ks = pool[:n_active]
    khi = np.full(u, EMPTY_HI, np.uint32)
    klo = np.full(u, EMPTY_HI, np.uint32)
    khi[:n_active] = (ks >> 32).astype(np.uint32)
    klo[:n_active] = (ks & 0xFFFFFFFF).astype(np.uint32)
    upd = np.zeros(u, np.float32)
    upd[:n_active] = rng.normal(size=n_active).astype(np.float32)
    return jnp.asarray(khi), jnp.asarray(klo), jnp.asarray(upd)


def _empty_table():
    rows = jnp.full((NB, 256), EMPTY_HI, jnp.uint32)
    vals = jnp.zeros((NB, 128), jnp.float32)
    return rows, vals


def _as_dict(rows, vals):
    rows = np.asarray(rows)
    vals = np.asarray(vals)
    out = {}
    for b in range(rows.shape[0]):
        for s in range(128):
            hi, lo = rows[b, s], rows[b, 128 + s]
            if hi != np.uint32(EMPTY_HI):
                out[(int(hi), int(lo))] = float(vals[b, s])
    return out


def test_pallas_matches_xla_insert_and_accumulate():
    khi, klo, upd = _records(1000, 1024, seed=0)
    rows_p, vals_p = _empty_table()
    rows_x, vals_x = _empty_table()
    rows_p, vals_p = pallas_lookup_accumulate(
        khi, klo, upd, rows_p, vals_p, interpret=True
    )
    rows_x, vals_x = xla_lookup_accumulate(khi, klo, upd, rows_x, vals_x)
    d_p = _as_dict(rows_p, vals_p)
    d_x = _as_dict(rows_x, vals_x)
    assert set(d_p) == set(d_x) and len(d_p) == 1000
    for k in d_p:
        assert d_p[k] == pytest.approx(d_x[k], abs=1e-6)


def test_pallas_second_batch_finds_existing_keys():
    """Keys inserted by batch 1 are FOUND (not re-inserted) by batch 2 and
    their values accumulate; prefix-fill invariant preserved."""
    khi, klo, upd = _records(512, 512, seed=1)
    rows, vals = _empty_table()
    rows, vals = pallas_lookup_accumulate(
        khi, klo, upd, rows, vals, interpret=True
    )
    rows, vals = pallas_lookup_accumulate(
        khi, klo, upd, rows, vals, interpret=True
    )
    d = _as_dict(rows, vals)
    assert len(d) == 512  # no duplicate inserts
    khi_np, klo_np, upd_np = map(np.asarray, (khi, klo, upd))
    for i in range(512):
        k = (int(khi_np[i]), int(klo_np[i]))
        assert d[k] == pytest.approx(2 * float(upd_np[i]), abs=1e-6)
    # prefix-fill: no occupied slot after an empty one in any bucket
    rows_np = np.asarray(rows)
    for b in range(NB):
        occ = rows_np[b, :128] != np.uint32(EMPTY_HI)
        first_empty = np.argmin(occ) if not occ.all() else 128
        assert not occ[first_empty:].any()


def test_pallas_inactive_lanes_untouched():
    khi, klo, upd = _records(100, 256, seed=2)
    rows0, vals0 = _empty_table()
    rows, vals = pallas_lookup_accumulate(
        khi, klo, upd, rows0, vals0, interpret=True
    )
    assert len(_as_dict(rows, vals)) == 100
    # all-inactive batch is a no-op
    khi2 = jnp.full((256,), EMPTY_HI, jnp.uint32)
    rows2, vals2 = pallas_lookup_accumulate(
        khi2, khi2, jnp.ones((256,), jnp.float32), rows, vals, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(rows2), np.asarray(rows))
    np.testing.assert_array_equal(np.asarray(vals2), np.asarray(vals))
