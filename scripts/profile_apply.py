"""Phase-level wall-clock profile of apply_records_batched on the real TPU.

The full-window engine measures ~46 ms device time per 8-frame window apply;
this times its constituent primitives at the exact bench shapes (B=8,
U=131072, bb=3*U, capacity 2^24) to locate the dominant cost.

Usage: python scripts/profile_apply.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from sonar_3d_reconstruction_tpu.utils.compile_cache import enable as _enable
_enable()

from sonar_3d_reconstruction_tpu.grid.hash import (
    BUCKET_SLOTS, EMPTY_HI, bucket_lookup, empty_key_rows, plan_insert,
    commit_insert,
)
from sonar_3d_reconstruction_tpu.ops.dedup import running_max

B, U = 8, 131072
BB = 3 * U              # batch budget (bench default)
LB = 2 * BB             # lane budget
CAP = 1 << 24
N = B * U

rng = np.random.default_rng(0)
print(f"B={B} U={U} bb={BB} Lb={LB} cap={CAP} n={N} "
      f"device={jax.devices()[0].platform}", flush=True)

# realistic record streams: ~60k uniques/frame, heavy overlap across frames
n_uni = 60_000
base_keys = rng.integers(0, 1 << 40, size=4 * n_uni, dtype=np.uint64)
hi_np = np.full((B, U), EMPTY_HI, np.uint32)
lo_np = np.full((B, U), EMPTY_HI, np.uint32)
for b in range(B):
    ks = rng.choice(base_keys, size=n_uni, replace=False)
    hi_np[b, :n_uni] = (ks >> 32).astype(np.uint32)
    lo_np[b, :n_uni] = (ks & 0xFFFFFFFF).astype(np.uint32)
hi = jnp.asarray(hi_np)
lo = jnp.asarray(lo_np)
cnt = jnp.asarray(
    rng.integers(1, 30, size=(B, U)).astype(np.int32))
occ = jnp.asarray(rng.integers(0, 5, size=(B, U)).astype(np.int32))
key_rows = empty_key_rows(CAP)
log_odds = jnp.zeros((CAP,), jnp.float32)
c_hi = jnp.asarray(hi_np[0, :BB].repeat(3)[:BB])
c_lo = jnp.asarray(lo_np[0, :BB].repeat(3)[:BB])
buckets = jnp.asarray(rng.integers(0, CAP // BUCKET_SLOTS, size=BB), jnp.int32)
jax.block_until_ready((hi, lo, cnt, occ, key_rows, log_odds))


def timeit(label, fn, reps=5):
    fn(0)
    best = float("inf")
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        fn(r)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:52s} {best*1e3:9.2f} ms", flush=True)
    return best


# -- (a) the big (voxel, frame) sort: 5 arrays, 3 keys, n = B*U lanes
@jax.jit
def big_sort(hi, lo, cnt, occ, salt):
    f = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.uint32)[:, None], (B, U)).reshape(-1)
    s = jax.lax.sort(
        (hi.reshape(-1) ^ salt, lo.reshape(-1), f, cnt.reshape(-1),
         occ.reshape(-1)),
        num_keys=3,
    )
    return s[0][0] + s[3][-1].astype(jnp.uint32)

timeit("big sort (5 arrays, 3 keys, n=B*U)",
       lambda r: int(big_sort(hi, lo, cnt, occ, jnp.uint32(r))))


# -- (a2) narrower variant: frame packed into lo spare bits, count+occ packed
@jax.jit
def packed_sort(hi, lo, cnt, occ, salt):
    f = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.uint32)[:, None], (B, U)).reshape(-1)
    lo2 = (lo.reshape(-1) << 3) | f
    pay = (cnt.reshape(-1).astype(jnp.uint32) << 16) | occ.reshape(-1).astype(jnp.uint32)
    s = jax.lax.sort((hi.reshape(-1) ^ salt, lo2, pay), num_keys=2)
    return s[0][0] + s[2][-1]

timeit("packed sort (3 arrays, 2 keys, n=B*U)",
       lambda r: int(packed_sort(hi, lo, cnt, occ, jnp.uint32(r))))


# -- (b) segment scan machinery at n lanes (running_max x2 + cumsum)
@jax.jit
def seg_scans(hi, lo, salt):
    h = hi.reshape(-1) ^ salt
    l = lo.reshape(-1)
    idx = jnp.arange(N, dtype=jnp.int32)
    new_seg = jnp.concatenate(
        [jnp.ones((1,), bool), (h[1:] != h[:-1]) | (l[1:] != l[:-1])])
    rank = idx - running_max(jnp.where(new_seg, idx, -1))
    seg_id = jnp.cumsum(new_seg.astype(jnp.int32)) - 1
    return rank[-1] + seg_id[-1]

timeit("segment scans (running_max + cumsum, n)",
       lambda r: int(seg_scans(hi, lo, jnp.uint32(r))))


# -- (c) compaction sort at Lb lanes (3 arrays, 1 key)
@jax.jit
def compaction(hi, lo, salt):
    h = (hi.reshape(-1) ^ salt)[:LB]
    l = lo.reshape(-1)[:LB]
    nr = (h & 1).astype(jnp.uint32)
    s = jax.lax.sort((nr, h, l), num_keys=1)
    return s[1][0]

timeit("compaction sort (3 arrays, 1 key, Lb)",
       lambda r: int(compaction(hi, lo, jnp.uint32(r))))


# -- (d) bucket lookup: one (bb, 256) row gather + compare
@jax.jit
def lookup(key_rows, ch, cl, salt):
    bucket, found, found_slot, fill = bucket_lookup(key_rows, ch ^ salt, cl)
    return jnp.sum(found) + found_slot[0] + fill[0]

timeit("bucket_lookup ((bb,256) row gather + eq)",
       lambda r: int(lookup(key_rows, c_hi, c_lo, jnp.uint32(r))))


# -- (e) plan + commit insert at bb lanes
@jax.jit
def insert(key_rows, ch, cl, salt):
    ch = ch ^ salt
    bucket, found, found_slot, fill = bucket_lookup(key_rows, ch, cl)
    need = ~found & (ch != EMPTY_HI)
    plan = plan_insert(key_rows, ch, cl, need, bucket, fill)
    kr = commit_insert(key_rows, plan, abort=jnp.zeros((), bool))
    return kr[0, 0] + plan.n_inserted.astype(jnp.uint32)

timeit("plan+commit insert (bb lanes)",
       lambda r: int(insert(key_rows, c_hi, c_lo, jnp.uint32(r))))


# -- (f) chain evaluation: B-1 rank-stepped passes over Lb lanes
@jax.jit
def chain_eval(cnt, occ, salt):
    c = cnt.reshape(-1)[:LB].astype(jnp.float32) + salt
    o = occ.reshape(-1)[:LB].astype(jnp.float32)
    rank = jnp.asarray(
        rng.integers(0, B, size=LB).astype(np.int32))
    v = c * 1.5 + o
    v = jax.nn.sigmoid(v) * c  # stand-in for finalize_voxel_updates cost
    for s in range(1, B):
        v_prev = jnp.concatenate([v[:1], v[:-1]])
        v_s = jax.nn.sigmoid(v_prev) * c
        v = jnp.where(rank == s, v_s, v)
    return v[0]

timeit("chain eval (B-1 masked passes, Lb lanes)",
       lambda r: float(chain_eval(cnt, occ, jnp.float32(r))))


# -- (g) value gather + scatters at bb lanes into capacity table
@jax.jit
def scatters(log_odds, salt):
    slots = jnp.asarray(rng.integers(0, CAP, size=BB), jnp.int32)
    vals = jnp.arange(BB, dtype=jnp.float32) + salt
    got = log_odds[slots]
    new = log_odds.at[slots].set(vals + got, mode="drop")
    return new[0]

timeit("value gather + scatter (bb lanes -> table)",
       lambda r: float(scatters(log_odds, jnp.float32(r))))
