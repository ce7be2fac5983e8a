"""Scale demo: polynomial 4PDM on a CAS(ncas, ncas) active space
(VERDICT r2 item 4: the reference's symbol-free NPDM engine,
general_npdm.hpp:43, is routinely run at ncas ~16; demonstrate ours at
that size with wall-clock, plus a determinant-path cross-check at small
ncas).

Usage: python scripts/run_npdm_scale.py [ncas] [D] [order] [device01]
Prints one `NPDM_SCALE {json}` line.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), _os.pardir)))
import json
import sys
import time

import numpy as np

from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.npdm_scheme import npdm_spatial_poly
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.driver.core import DMRGDriver, SymmetryTypes

NCAS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
D = int(sys.argv[2]) if len(sys.argv) > 2 else 200
ORDER = int(sys.argv[3]) if len(sys.argv) > 3 else 4
DEVICE = bool(int(sys.argv[4])) if len(sys.argv) > 4 else False

res = {"ncas": NCAS, "D": D, "order": ORDER, "device": DEVICE}

t0 = time.time()
fd_full = FCIDUMP.parse("/root/reference/data/CR2.SVP.FCIDUMP")
ni = (fd_full.n_elec - NCAS) // 2
drv = DMRGDriver(SymmetryTypes.SZ)
fd = drv.get_cas_fcidump(fd_full, ni, NCAS)
drv.initialize_system(NCAS, NCAS, 0, orb_sym=fd.orb_sym)
res["cas"] = f"CR2.SVP CAS({NCAS}o,{NCAS}e), n_inactive={ni}"
res["t_cas_s"] = round(time.time() - t0, 1)

t0 = time.time()
mpo = drv.get_qc_mpo(fcidump=fd)
mps = drv.get_random_mps(D, target=(NCAS, 0, 0))
e = DMRG(mpo, mps, iprint=0).solve(
    [D], [1e-4, 1e-5, 0], [1e-8], n_sweeps=6, tol=1e-8)
res["dmrg_energy"] = float(e)
res["t_dmrg_s"] = round(time.time() - t0, 1)
print("dmrg done E=%.8f t=%.1f" % (e, res["t_dmrg_s"]), flush=True)

t0 = time.time()
dm = npdm_spatial_poly(mps, ORDER, device=DEVICE)
res["t_npdm_s"] = round(time.time() - t0, 1)
res["npdm_gb"] = round(dm.nbytes / 2**30, 2)
print("npdm done t=%.1f  %.2f GB" % (res["t_npdm_s"], res["npdm_gb"]),
      flush=True)

# sanity: full trace of the k-PDM = N (N-1) ... (N-k+1)
tr = dm
for _ in range(ORDER):
    tr = np.trace(tr, axis1=0, axis2=tr.ndim - 1)
n = NCAS
expect = 1.0
for m in range(ORDER):
    expect *= (n - m)
res["trace"] = float(tr)
res["trace_expected"] = expect
res["trace_ok"] = bool(abs(tr - expect) < 1e-6 * max(expect, 1.0))

print("NPDM_SCALE " + json.dumps(res), flush=True)
