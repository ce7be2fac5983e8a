"""4PDM device-offload leg (VERDICT r4 item 6): the pooled polynomial
NPDM engine's middle class GEMMs closed on the accelerator
(dmrg/npdm_scheme._device_gemm) vs the host-BLAS baseline
(RESULTS/npdm_scale.json: CAS(12,12) 4PDM = 2017 s on one core).

Usage: python scripts/run_npdm_device.py [ncas] [D] [order] [host|device]
Prints one `NPDM_DEVICE {json}` line; appends to RESULTS/npdm_scale.json.

Process hygiene: PID file /tmp/npdm_device.pid, removed on exit.
"""

import atexit
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, os.pardir))
sys.path.insert(0, REPO)

PIDFILE = "/tmp/npdm_device.pid"
with open(PIDFILE, "w") as f:
    f.write(str(os.getpid()))
atexit.register(lambda: os.path.exists(PIDFILE) and os.remove(PIDFILE))

from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.npdm_scheme import npdm_spatial_poly
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.driver.core import DMRGDriver, SymmetryTypes

NCAS = int(sys.argv[1]) if len(sys.argv) > 1 else 12
D = int(sys.argv[2]) if len(sys.argv) > 2 else 150
ORDER = int(sys.argv[3]) if len(sys.argv) > 3 else 4
MODE = sys.argv[4] if len(sys.argv) > 4 else "device"

res = {"ncas": NCAS, "D": D, "order": ORDER, "mode": MODE}
fd = FCIDUMP.parse("/root/reference/data/CR2.SVP.FCIDUMP")
ncore = (fd.n_elec - NCAS) // 2

t0 = time.time()
drv = DMRGDriver(SymmetryTypes.SZ)
cfd = drv.get_cas_fcidump(fd, ncore, NCAS)
drv.initialize_system(NCAS, NCAS, 0, orb_sym=cfd.orb_sym)
mpo = drv.get_qc_mpo(fcidump=cfd)
mps = drv.get_random_mps(D, target=(NCAS, 0, 0))
e_cas = DMRG(mpo, mps, iprint=0).solve(
    [D], [1e-4, 1e-5, 0], [1e-8], n_sweeps=8, tol=1e-9)
res["e_cas_dmrg"] = float(e_cas)
res["t_dmrg_s"] = round(time.time() - t0, 1)
print("dmrg done E=%.8f t=%.1f" % (e_cas, res["t_dmrg_s"]), flush=True)

t0 = time.time()
pdm = npdm_spatial_poly(mps, ORDER, device=(MODE == "device"))
res["t_npdm_s"] = round(time.time() - t0, 1)
res["npdm_gb"] = round(pdm.nbytes / 1e9, 2)
# trace identity: tr G_k = N (N-1) ... (N-k+1)
tr = pdm
for _ in range(ORDER):
    tr = np.trace(tr, axis1=0, axis2=tr.ndim - 1)
expect = 1.0
for m in range(ORDER):
    expect *= NCAS - m
res["trace"] = float(tr)
res["trace_expected"] = expect
res["trace_ok"] = bool(abs(float(tr) - expect) < 1e-8 * max(expect, 1))
print("NPDM_DEVICE " + json.dumps(res), flush=True)

path = os.path.join(REPO, "RESULTS", "npdm_scale.json")
try:
    with open(path) as f:
        rec = json.load(f)
except Exception:
    rec = {}
rec.setdefault("runs", {})[
    f"cas{NCAS}_order{ORDER}_{MODE}_r5"] = res
with open(path, "w") as f:
    json.dump(rec, f, indent=1)
