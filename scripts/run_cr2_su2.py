"""Cr2/SVP in SU(2) mode on the device engine (VERDICT r3 item 3: the
north-star baseline is spin-adapted; block2-SU2 does the full D=250
sweep in 20-61 s host-side).  Round 4 made this feasible: the SU(2)
env contraction runs on the abelian blockv2 device kernels
(ops/su2blk.py) instead of the interpreted loop (>50 min/bond in r3).

Usage: python scripts/run_cr2_su2.py [D] [n_sweeps] [backend]
Prints per-sweep timings and one `CR2_SU2 {json}` line.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), _os.pardir)))
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault(
    "B2TPU_PLAN_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 os.pardir, ".cache", "plans"))


def _warm_backend(retries: int = 5) -> None:
    import jax
    for i in range(retries):
        try:
            print("devices:", jax.devices(), flush=True)
            return
        except RuntimeError as e:
            print(f"backend init retry {i}: {e}", flush=True)
            time.sleep(5.0)


_warm_backend()

from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.su2_qc import su2_qc_dmrg

D = int(sys.argv[1]) if len(sys.argv) > 1 else 250
n_sweeps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
backend = sys.argv[3] if len(sys.argv) > 3 else "jax_tiled"

res = {"D": D, "backend": backend}
t0 = time.time()
fd = FCIDUMP.parse("/root/reference/data/CR2.SVP.FCIDUMP")
eng = su2_qc_dmrg(fd.h1e, fd.g2e, ecore=fd.const_e, n_elec=fd.n_elec,
                  twos=fd.twos, orb_sym=fd.orb_sym, ipg=fd.ipg,
                  bond_dim=D, iprint=1, backend=backend,
                  exec_dtype=np.float64)
res["t_setup_env_s"] = round(time.time() - t0, 1)
print("setup+env init t=%.1fs" % res["t_setup_env_s"], flush=True)

sweep_ts = []
e = None
for isw in range(n_sweeps):
    ts = time.time()
    e = eng.solve(n_sweeps=1, tol=0)
    sweep_ts.append(round(time.time() - ts, 1))
    print("SU2 sweep %d E = %.10f t = %.1fs"
          % (isw, e, sweep_ts[-1]), flush=True)
res["sweep_s"] = sweep_ts
res["energy"] = float(e) if e is not None else None
res["block2_bar"] = "block2 SU2 1-thread: 20-61 s per full D=250 sweep"
print("CR2_SU2 " + json.dumps(res), flush=True)
