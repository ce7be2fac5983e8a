"""Microbench mix-kernel scatter strategies on the real TPU.

The resident-engine mix (ops/resident._mix_exec) scatter-adds [B,T,T]
operator tiles into a flat slab pool inside lax.scan — measured 17-55 s
per mid-chain Cr2 site.  Candidate replacements, all fed the same
synthetic Cr2-like task set (T=64, blocks ~16x24 -> ~85% tile padding):

  scan_base : the shipped _mix_exec (baseline)
  flat_add  : one .at[].add over all tiles, no scan
  exact_add : element-exact (no T x T padding) .at[].add, indices built
              on device via searchsorted over per-contrib element counts
  seg_sorted: exact elements pre-sorted by destination (host order,
              device values) -> segment_sum(indices_are_sorted=True)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_mix_scatter.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from functools import partial

from block2_preview_tpu.ops.resident import _mix_exec, _MIX_SCAN, _MIX_B

T = 64
rng = np.random.RandomState(0)

# synthetic contribution set shaped like a mid-chain Cr2 LW mix:
# nc contributions, block dims db,dk ~ U[8,40], j-multiplicity via
# repeated windows (10% of windows shared by ~32 contribs)
NC = 100_000
db = rng.randint(8, 41, NC)
dk = rng.randint(8, 41, NC)
EPOOL = 30_000_000
NCAP = 1 << 26
ebase = rng.randint(0, EPOOL - 64 * 64, NC)
estr = dk.copy()
# windows: mostly unique, some heavily shared
nwin = NC // 4
win = rng.randint(0, nwin, NC)
wbase = rng.randint(0, NCAP - 8192, nwin)
wors = rng.randint(40, 200, nwin)
wocs = rng.randint(1, 4, nwin)
# force shared windows to share dims
wdb = rng.randint(8, 41, nwin)
wdk = rng.randint(8, 41, nwin)
db = wdb[win]
dk = wdk[win]
obase = wbase[win]
ors = wors[win]
ocs = wocs[win]
cf = rng.standard_normal(NC)

epool = jnp.asarray(rng.standard_normal(EPOOL).astype(np.float32))


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def timeit(fn, n=3):
    fn()  # compile + warm
    t0 = time.time()
    for _ in range(n):
        r = fn()
    sync(r)
    return (time.time() - t0) / n


# --- baseline: shipped _mix_exec ------------------------------------------
nr = -(-db // T)
ncc = -(-dk // T)
per = nr * ncc
tot = int(per.sum())
it = np.repeat(np.arange(NC), per)
cum = np.concatenate([[0], np.cumsum(per)[:-1]])
o = np.arange(tot) - np.repeat(cum, per)
ri = o // ncc[it]
ci = o % ncc[it]
t_eb = ebase[it] + ri * T * dk[it] + ci * T
t_es = dk[it]
t_rm = db[it] - ri * T
t_cm = dk[it] - ci * T
t_ors = ors[it]
t_ocs = ocs[it]
t_ob = obase[it] + ri * T * t_ors + ci * T * t_ocs
t_cf = cf[it]
order = np.argsort(t_ob, kind="stable")
B = _MIX_B
n_launch = -(-tot // (B * _MIX_SCAN))
capn = n_launch * B * _MIX_SCAN
s_arr = np.zeros((7, capn), dtype=np.int32)
s_arr[4, :] = -1
cf_arr = np.zeros(capn, dtype=np.float32)
for row, arr in enumerate((t_eb, t_es, t_rm, t_cm, t_ob, t_ors, t_ocs)):
    s_arr[row, :tot] = arr[order]
cf_arr[:tot] = t_cf[order]
s_d = jnp.asarray(s_arr.reshape(7, n_launch, _MIX_SCAN, B)
                  .transpose(1, 2, 0, 3))
cf_d = jnp.asarray(cf_arr.reshape(n_launch, _MIX_SCAN, B))


def run_base():
    out = jnp.zeros(NCAP + 1, dtype=jnp.float32)
    for li in range(n_launch):
        out = _mix_exec(out, epool, s_d[li], cf_d[li], T, NCAP, _MIX_SCAN)
    return out


print(f"tasks: nc={NC} tile_tasks={tot} pad_elems={tot * T * T / 1e6:.0f}M "
      f"exact_elems={(db * dk).sum() / 1e6:.0f}M n_launch={n_launch}",
      flush=True)
print("running base...", flush=True)
dt = timeit(run_base, 1)
print(f"scan_base : {dt:.2f} s  ({tot * T * T / dt / 1e6:.0f} M padel/s)",
      flush=True)


# --- exact-element scatter, device-built indices --------------------------
elems = (db * dk).astype(np.int64)
ecum = np.concatenate([[0], np.cumsum(elems)])
ETOT = int(ecum[-1])
d7 = jnp.asarray(np.stack([ebase, dk, db, obase, ors, ocs,
                           np.arange(NC)]).astype(np.int64))
cfj = jnp.asarray(cf.astype(np.float32))
ecum_d = jnp.asarray(ecum)
CH = 1 << 24


@partial(jax.jit, static_argnames=("ch",))
def exact_add_chunk(out, e0, ch):
    eid = e0 + jnp.arange(ch, dtype=jnp.int64)
    c_ = jnp.searchsorted(ecum_d, eid, side="right") - 1
    c_ = jnp.clip(c_, 0, NC - 1)
    o_ = eid - ecum_d[c_]
    dkc = d7[1][c_]
    r_ = o_ // dkc
    cc = o_ % dkc
    ok = eid < ETOT
    src = d7[0][c_] + r_ * dkc + cc
    dst = d7[3][c_] + r_ * d7[4][c_] + cc * d7[5][c_]
    vals = jnp.where(ok, epool[jnp.where(ok, src, 0)] * cfj[c_], 0)
    return out.at[jnp.where(ok, dst, NCAP)].add(vals, mode="drop")


def run_exact():
    out = jnp.zeros(NCAP + 1, dtype=jnp.float32)
    for e0 in range(0, ETOT, CH):
        out = exact_add_chunk(out, jnp.asarray(e0, jnp.int64), CH)
    return out


print("running exact...", flush=True)
dt = timeit(run_exact, 1)
print(f"exact_add : {dt:.2f} s  ({ETOT / dt / 1e6:.0f} M el/s)", flush=True)


# --- exact elements, host-sorted by dst, segment_sum(sorted) ---------------
# host builds the per-element ORDER once (plan time); device still builds
# idx/vals itself, then applies the permutation and a sorted segment_sum
it_e = np.repeat(np.arange(NC), elems)
o_e = np.arange(ETOT) - np.repeat(ecum[:-1], elems)
r_e = o_e // dk[it_e]
c_e = o_e % dk[it_e]
dst_e = obase[it_e] + r_e * ors[it_e] + c_e * ocs[it_e]
src_e = ebase[it_e] + r_e * dk[it_e] + c_e
perm = np.argsort(dst_e, kind="stable")
dst_s = jnp.asarray(dst_e[perm])
src_s = jnp.asarray(src_e[perm])
cf_s = jnp.asarray(cf[it_e][perm].astype(np.float32))


@jax.jit
def run_seg():
    vals = epool[src_s] * cf_s
    return jax.ops.segment_sum(vals, dst_s, num_segments=NCAP + 1,
                               indices_are_sorted=True)


print("running seg...", flush=True)
dt = timeit(run_seg, 2)
print(f"seg_sorted: {dt:.2f} s  ({ETOT / dt / 1e6:.0f} M el/s)  "
      f"(+host idx {dst_e.nbytes / 1e6:.0f}MB/site upload)", flush=True)

# parity check exact vs base
a = np.asarray(run_base()[:NCAP])
b = np.asarray(run_exact()[:NCAP])
c_ = np.asarray(run_seg()[:NCAP])
print("parity exact vs base:", float(np.abs(a - b).max()),
      " seg vs base:", float(np.abs(a - c_).max()), flush=True)
