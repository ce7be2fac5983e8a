"""Part 2: load the saved bond-24 state and run the tiled blocking kernel
for bond 23 under several variants to isolate the TPU worker fault.

Usage: python scripts/probe_tiled_part2.py <variant> [D] [STOP]
variants:
  scan     - the production kernel (lax.scan over groups)   [crashes?]
  loop     - python loop over groups, jit per group          [bisect]
  nos3     - loop, but skip the stage-3 scatter
  info     - just print plan statistics, no execution
"""

import pickle
import sys
import time

import numpy as np

variant = sys.argv[1] if len(sys.argv) > 1 else "info"
D = int(sys.argv[2]) if len(sys.argv) > 2 else 250
STOP = int(sys.argv[3]) if len(sys.argv) > 3 else 24
T_BOND = STOP - 1

from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.ops.stacked import StackedMeta, _cap_class
from block2_preview_tpu.ops.tiled_blocking import (
    build_tiled_blocking_plan, _tiled_blocking_exec, _gtile)

t0 = time.time()
fd = FCIDUMP.parse("/root/reference/data/CR2.SVP.FCIDUMP")
tt = qc_term_table(fd)
mpo = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
target = (fd.n_elec, fd.twos, fd.ipg)
info = MPSInfo(mpo.group, mpo.site_quanta, target, D)
occs = np.loadtxt("/root/reference/data/CR2.SVP.OCC")
info.set_bond_dimension_using_occ(occs.ravel(), bias=2.0)
mps = MPS.random(info)
with open(f"/tmp/cr2_state_D{D}_b{STOP}.pkl", "rb") as f:
    st = pickle.load(f)
meta = StackedMeta(st["groups"], st["sectors"], st["total"])
pool = st["pool"]
print(f"state loaded t={time.time()-t0:.1f}s pool={len(pool)}", flush=True)

t = T_BOND
plan = build_tiled_blocking_plan(
    meta, mpo.tensors[t], mpo.site_quanta[t], mps.tensors[t],
    mps.tensors[t], mpo.group, "right",
    mpo.bond_dqs[t + 1], mpo.bond_dqs[t])
print(f"plan built t={time.time()-t0:.1f}s", flush=True)
G, _, B = plan.s1.shape
print(f"T={plan.T} G={G} B={B} nt1={plan.nt1} ntp={plan.ntp} "
      f"ncap={plan.ncap} meta_out_total={plan.meta_out.total} "
      f"s3_valid={(plan.s3[:, 1, :] >= 0).sum()}", flush=True)
print(f"idx ranges: s1 base max={plan.s1[:,0,:].max()} "
      f"s2 base max={plan.s2[:,0,:].max()} s3 base max={plan.s3[:,1,:].max()}",
      flush=True)

if variant == "info":
    sys.exit(0)

import jax
import jax.numpy as jnp
from jax import lax
from functools import partial

dt = np.float32
epool = jnp.asarray(pool.astype(dt))

if variant == "scan":
    from block2_preview_tpu.ops.tiled_blocking import execute_tiled_blocking
    out = execute_tiled_blocking(plan, epool, dtype=dt)
    out.block_until_ready()
    print("scan OK, |out| =", float(jnp.abs(out).sum()), flush=True)
    sys.exit(0)


@partial(jax.jit, static_argnames=("nt1", "ntp", "T", "left", "ncap",
                                   "do_s3"))
def _one_group(out, epool, bpool, kpool, g1, g2, g3, cf,
               nt1, ntp, T, left, ncap, do_s3):
    hi = lax.Precision.HIGHEST
    E = _gtile(epool, g1[0], g1[1], g1[2], g1[3], T)
    K = _gtile(kpool, g1[4], g1[5], g1[6], g1[7], T)
    if left:
        p1 = jnp.einsum("blk,bky->bly", E, K, precision=hi,
                        preferred_element_type=epool.dtype)
    else:
        p1 = jnp.einsum("blk,byk->bly", E, K, precision=hi,
                        preferred_element_type=epool.dtype)
    tmp = jax.ops.segment_sum(p1, g1[8], num_segments=nt1 + 1,
                              indices_are_sorted=True)
    Bm = _gtile(bpool, g2[0], g2[1], g2[2], g2[3], T)
    if left:
        p2 = jnp.einsum("blx,bly->bxy", Bm, tmp[g2[4]], precision=hi,
                        preferred_element_type=epool.dtype)
    else:
        p2 = jnp.einsum("bxl,bly->bxy", Bm, tmp[g2[4]], precision=hi,
                        preferred_element_type=epool.dtype)
    prod = jax.ops.segment_sum(p2, g2[5], num_segments=ntp + 1,
                               indices_are_sorted=True)
    if not do_s3:
        return out + prod.sum() * 0
    vals = prod[g3[0]] * cf[:, None, None]
    r = jnp.arange(T)[None, :, None]
    c = jnp.arange(T)[None, None, :]
    idx = g3[1][:, None, None] + r * g3[2][:, None, None] + c
    ok = (r < g3[3][:, None, None]) & (c < g3[4][:, None, None]) & \
        (g3[1][:, None, None] >= 0)
    return out.at[jnp.where(ok, idx, ncap)].add(vals, mode="drop")


# pack site pools like execute_tiled_blocking does
def pack(mats, offs):
    p = np.zeros(int(offs[-1]) + 1, dtype=dt)
    for m, o in zip(mats, offs[:-1]):
        p[o:o + m.size] = np.asarray(m, dtype=dt).ravel()
    full = np.zeros(_cap_class(len(p)), dtype=dt)
    full[:len(p)] = p
    return jnp.asarray(full)


bpool = pack(*plan.bra_pool)
kpool = pack(*plan.ket_pool)
cfA = plan.coef.real.astype(dt)
out = jnp.zeros(plan.ncap, dtype=dt)
do_s3 = variant != "nos3"
for gi in range(G):
    tg = time.time()
    out = _one_group(out, epool, bpool, kpool,
                     jnp.asarray(plan.s1[gi]), jnp.asarray(plan.s2[gi]),
                     jnp.asarray(plan.s3[gi]), jnp.asarray(cfA[gi]),
                     plan.nt1, plan.ntp, plan.T, plan.left, plan.ncap,
                     do_s3)
    out.block_until_ready()
    print(f"group {gi}/{G} ok dt={time.time()-tg:.2f}s", flush=True)
print("loop OK, |out| =", float(jnp.abs(out).sum()), flush=True)
