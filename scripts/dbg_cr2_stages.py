"""Staged Cr2 sweep-0 debug: sync after blocking/mix pools and after the
diagonal before entering the device Davidson, printing per-site struct
sizes — localizes TPU worker faults to a stage."""

import os
import sys
import time

import numpy as np

D = int(sys.argv[1]) if len(sys.argv) > 1 else 250
n_sweeps = int(sys.argv[2]) if len(sys.argv) > 2 else 1

from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.dmrg.sweep import DMRG
import block2_preview_tpu.ops.resident as R

t0 = time.time()
fd = FCIDUMP.parse("/root/reference/data/CR2.SVP.FCIDUMP")
tt = qc_term_table(fd)
mpo = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
print(f"mpo ready t={time.time()-t0:.0f}s", flush=True)
target = (fd.n_elec, fd.twos, fd.ipg)
info = MPSInfo(mpo.group, mpo.site_quanta, target, D)
occs = np.loadtxt("/root/reference/data/CR2.SVP.OCC")
info.set_bond_dimension_using_occ(occs.ravel(), bias=2.0)
mps = MPS.random(info)

_orig = R.ResidentSite.solve_ground_state


def patched(self, x0, **kw):
    ts = time.time()
    self.lw_pool.block_until_ready()
    self.rw_pool.block_until_ready()
    s = self.ex.struct
    print(f"   [sync t={self.eff.t}] pools lw={self.lw_pool.shape} "
          f"rw={self.rw_pool.shape} t={time.time()-ts:.1f}s", flush=True)
    ts = time.time()
    dgt = self.diagonal_device()
    dgt.block_until_ready()
    print(f"   [sync t={self.eff.t}] diag ok size_p={s['size_p']} "
          f"nt1={s['nt1']} nt2={s['nt2']} T={s['T']} B={s['B']} "
          f"ngrp={len(s['g1'])} t={time.time()-ts:.1f}s", flush=True)
    if self.eff.t >= 6:
        np.savez("/tmp/site%d_struct.npz" % self.eff.t,
                 lw_shape=np.asarray(self.lw_pool.shape),
                 rw_shape=np.asarray(self.rw_pool.shape),
                 **{k: np.asarray(v) for k, v in self.ex.struct.items()
                    if isinstance(v, np.ndarray)},
                 scalars=np.asarray([s["T"], s["B"], s["nt1"], s["nt2"],
                                     s["size_p"], s["sizb_p"],
                                     len(s["g1"])]))
        print(f"   [sync t={self.eff.t}] struct dumped", flush=True)
        import jax.numpy as jnp
        ts = time.time()
        xp = jnp.asarray(self.ex.pad(x0))
        y = self.ex.matvec_device(xp, self.lw_pool, self.rw_pool)
        y.block_until_ready()
        print(f"   [sync t={self.eff.t}] single matvec ok "
              f"|y|={float(abs(y).max()):.3e} t={time.time()-ts:.1f}s",
              flush=True)
    ts = time.time()
    out = _orig(self, x0, **kw)
    print(f"   [sync t={self.eff.t}] davidson ok nmv={out[2]} "
          f"t={time.time()-ts:.1f}s", flush=True)
    return out


R.ResidentSite.solve_ground_state = patched

dmrg = DMRG(mpo, mps, backend="jax_resident", dtype=np.float32, iprint=2,
            dav_max_iter=30)
e = dmrg.solve([D] * n_sweeps, [1e-4], [1e-4], n_sweeps=n_sweeps, tol=0)
print("FINAL E=%.10f  t=%.1fs" % (e, time.time() - t0), flush=True)
