"""SU(2) spin-adapted N2/STO-3G on the device engine (VERDICT r2 item 3:
N2-SU2 at D=500 through the jax_tiled executor at <= 1e-6 vs block2's
-107.654122447525).

Usage: python scripts/run_su2_n2.py [D] [backend] [n_sweeps]
Prints one `SU2_N2 {json}` line.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), _os.pardir)))
import json
import sys
import time

import numpy as np

from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.su2_qc import su2_qc_dmrg

D = int(sys.argv[1]) if len(sys.argv) > 1 else 500
backend = sys.argv[2] if len(sys.argv) > 2 else "jax_tiled"
n_sweeps = int(sys.argv[3]) if len(sys.argv) > 3 else 8

fd = FCIDUMP.parse("/root/reference/data/N2.STO3G.FCIDUMP")
t0 = time.time()
eng = su2_qc_dmrg(fd.h1e, fd.g2e, ecore=fd.const_e, n_elec=fd.n_elec,
                  twos=fd.twos, orb_sym=fd.orb_sym, ipg=fd.ipg,
                  bond_dim=D, iprint=0, backend=backend,
                  exec_dtype=np.float64)
t_setup = time.time() - t0
sweep_ts = []
e = None
for i in range(n_sweeps):
    t1 = time.time()
    e = eng.sweep(i % 2 == 0, 1e-9, 1e-5 if i < 2 else 0)
    sweep_ts.append(round(time.time() - t1, 2))
    print("sweep %d E=%.12f t=%.1f" % (i, e, sweep_ts[-1]), flush=True)
ref = -107.654122447525
res = {"D": D, "backend": backend, "t_setup_s": round(t_setup, 1),
       "sweep_s": sweep_ts, "energy": float(e),
       "abs_err_vs_block2": abs(e - ref),
       "pass_1e6": bool(abs(e - ref) < 1e-6)}
print("SU2_N2 " + json.dumps(res), flush=True)
