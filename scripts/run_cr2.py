"""Cr2/SVP (42 orbitals) production probe — the north-star deck.

Mirrors the reference run tests/cr2-gs/cr2-gs.py (D=250/500/750 schedule,
occupancy-biased warmup from CR2.SVP.OCC) on the device-resident stacked
engine.  Logs per-site wall time so the bottleneck profile is visible.

Usage: python scripts/run_cr2.py [D] [backend] [dtype] [n_sweeps]
"""

import sys
import time

import numpy as np


def _warm_backend(retries: int = 5) -> None:
    """Touch the accelerator backend before the heavy host-side setup:
    the remote-TPU plugin registration can time out when it first runs
    minutes into a CPU-saturated process, which kills the whole run."""
    import jax
    for i in range(retries):
        try:
            print("devices:", jax.devices(), flush=True)
            return
        except RuntimeError as e:
            print(f"backend init retry {i}: {e}", flush=True)
            time.sleep(5.0)
    raise RuntimeError("accelerator backend failed to initialize")


_warm_backend()

from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.dmrg.sweep import DMRG

D = int(sys.argv[1]) if len(sys.argv) > 1 else 250
backend = sys.argv[2] if len(sys.argv) > 2 else "jax_stacked"
dtype = {"f32": np.float32, "f64": np.float64}[
    sys.argv[3] if len(sys.argv) > 3 else "f32"]
n_sweeps = int(sys.argv[4]) if len(sys.argv) > 4 else 4

import os  # noqa: F401  (knobs like B2TPU_ROT_MAX settable by callers)

t0 = time.time()
fd = FCIDUMP.parse("/root/reference/data/CR2.SVP.FCIDUMP")
print(f"fcidump: n_sites={fd.n_sites} n_elec={fd.n_elec} "
      f"twos={fd.twos} t={time.time()-t0:.1f}s", flush=True)
tt = qc_term_table(fd)
print(f"terms: {len(tt.coeffs)} t={time.time()-t0:.1f}s", flush=True)
mpo = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
print(f"mpo: max bond {max(len(b) for b in mpo.bond_dqs)} "
      f"t={time.time()-t0:.1f}s", flush=True)

target = (fd.n_elec, fd.twos, fd.ipg)
info = MPSInfo(mpo.group, mpo.site_quanta, target, D)
occs = np.loadtxt("/root/reference/data/CR2.SVP.OCC")
info.set_bond_dimension_using_occ(occs.ravel(), bias=2.0)
mps = MPS.random(info)

t_env = time.time()
import os
dmi = int(os.environ.get("B2TPU_DAV_MAX_ITER",
                         30 if dtype == np.float32 else 100))
dmrg = DMRG(mpo, mps, backend=backend, dtype=dtype, iprint=2,
            dav_max_iter=dmi)
print(f"env init: t={time.time()-t_env:.1f}s", flush=True)
sched_d = [D] * n_sweeps
sched_n = [1e-4, 1e-5] + [0] * max(n_sweeps - 2, 0)
# f32: conv_thrd is on |r|^2; residual floor ~ eps_f32 * |H| — 1e-4 is the
# practical warmup setting (f64 polish sweeps tighten afterwards)
thrd = 1e-4 if dtype == np.float32 else 1e-7
e = dmrg.solve(sched_d, sched_n, [thrd], n_sweeps=n_sweeps, tol=0)
print("FINAL E=%.10f  t=%.1fs" % (e, time.time() - t0), flush=True)
