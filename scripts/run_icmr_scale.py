"""Scale demo: DMRG -> polynomial spatial RDMs -> spin-free sc-NEVPT2
on a CR2/SVP CAS (VERDICT r2 item 5: the reference's production regime
pyblock2/icmr/scnevpt2.py runs at CAS(16,16)-class sizes; the spatial
path keeps the 4-RDM at ncas^8 instead of (2 ncas)^8).

Usage: python scripts/run_icmr_scale.py [ncas] [D]
Prints one `ICMR_SCALE {json}` line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), os.pardir)))

from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.npdm_scheme import npdm_spatial_poly
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.driver.core import DMRGDriver, SymmetryTypes
from block2_preview_tpu.icmr.scnevpt2 import sc_nevpt2

NCAS = int(sys.argv[1]) if len(sys.argv) > 1 else 12
D = int(sys.argv[2]) if len(sys.argv) > 2 else 150

res = {"ncas": NCAS, "D": D}
fd = FCIDUMP.parse("/root/reference/data/CR2.SVP.FCIDUMP")
ncore = (fd.n_elec - NCAS) // 2
res["system"] = (f"CR2.SVP (42 orbitals): ncore={ncore}, ncas={NCAS}, "
                 f"nvirt={42 - ncore - NCAS}")

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
# RDMs cache on disk: every aborted E2 attempt previously re-paid the
# ~15-30 min G1-G4 production (r4 postmortem)
import os
cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         os.pardir, ".cache", "icmr")
os.makedirs(cache_dir, exist_ok=True)
gam = {}
for k in range(1, 5):
    tk = time.time()
    cpath = os.path.join(cache_dir, f"g{k}_ncas{NCAS}_d{D}.npy")
    if os.path.exists(cpath):
        gam[f"G{k}"] = np.load(cpath)
        print("G%d loaded from cache t=%.1f" % (k, time.time() - tk),
              flush=True)
    else:
        gam[f"G{k}"] = npdm_spatial_poly(mps, k)
        np.save(cpath, gam[f"G{k}"])
        print("G%d done t=%.1f" % (k, time.time() - tk), flush=True)
res["t_rdms_s"] = round(time.time() - t0, 1)

t0 = time.time()
p0 = time.process_time()
out = sc_nevpt2(fd, ncore, NCAS, spatial=True, gammas_spatial=gam,
                iprint=1)
res["t_scnevpt2_s"] = round(time.time() - t0, 1)
# contention-robust measure: CPU seconds actually consumed (this run
# may share the single host core with the Cr2 record run at nice 19)
res["t_scnevpt2_cpu_s"] = round(time.process_time() - p0, 1)
res["e2_classes"] = {k: float(v) for k, v in out.classes.items()}
res["e2_total"] = float(sum(out.classes.values()))
res["wall_total_s"] = round(res["t_dmrg_s"] + res["t_rdms_s"]
                            + res["t_scnevpt2_s"], 1)
print("ICMR_SCALE " + json.dumps(res), flush=True)
