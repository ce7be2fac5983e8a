"""Warm-vs-cold timing of the tiled matvec + Davidson at one Cr2 site."""

import sys
import time

import numpy as np

from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.dmrg.effective import EffectiveHamiltonian2
from block2_preview_tpu.ops.tiled import TiledExecutor

site = int(sys.argv[1]) if len(sys.argv) > 1 else 8
D = int(sys.argv[2]) if len(sys.argv) > 2 else 250

fd = FCIDUMP.parse("/root/reference/data/CR2.SVP.FCIDUMP")
tt = qc_term_table(fd)
mpo = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
info = MPSInfo(mpo.group, mpo.site_quanta, (fd.n_elec, fd.twos, fd.ipg), D)
occs = np.loadtxt("/root/reference/data/CR2.SVP.OCC")
info.set_bond_dimension_using_occ(occs.ravel(), bias=2.0)
mps = MPS.random(info)
dmrg = DMRG(mpo, mps, backend="jax_tiled", dtype=np.float32, iprint=0,
            dav_max_iter=30)
for t in range(site):
    dmrg.update_two_dot(t, True, D, 1e-4, 1e-4)
    print("warmed site", t, flush=True)

eff = EffectiveHamiltonian2(dmrg.me, site)
t0 = time.time()
ex = TiledExecutor(eff, dtype=np.float32)
print(f"exec build {time.time()-t0:.2f}s  T={ex.T} "
      f"G={ex.struct['la'].shape[0]} B={ex.struct['B']} "
      f"triples={len(eff.triples)} size={eff.size}", flush=True)
x0 = eff.flatten(eff.initial_guess()).astype(np.float64)
x0 /= np.linalg.norm(x0)
diag = eff.diagonal()

import jax
xp = __import__("jax.numpy", fromlist=["x"]).asarray(ex.pad(x0))
t0 = time.time()
out = ex.matvec_device(xp).block_until_ready()
print(f"matvec cold {time.time()-t0:.2f}s", flush=True)
for _ in range(3):
    t0 = time.time()
    out = ex.matvec_device(xp).block_until_ready()
    print(f"matvec warm {time.time()-t0:.4f}s", flush=True)

t0 = time.time()
th, xv, it = ex.solve_ground_state(x0, diag, conv_thrd=1e-4, max_iter=30)
print(f"dav cold {time.time()-t0:.2f}s  it={it}", flush=True)
t0 = time.time()
th, xv, it = ex.solve_ground_state(x0, diag, conv_thrd=1e-4, max_iter=30)
print(f"dav warm {time.time()-t0:.2f}s  it={it}", flush=True)
