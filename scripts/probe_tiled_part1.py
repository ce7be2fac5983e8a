"""Part 1: build Cr2 MPO/MPS (deterministic), run right blocking (bucket
engine, known good) down to bond STOP, pickle the stacked meta+pool there
for fast part-2 kernel iteration."""

import pickle
import sys
import time

import numpy as np

D = int(sys.argv[1]) if len(sys.argv) > 1 else 250
STOP = int(sys.argv[2]) if len(sys.argv) > 2 else 24

from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.dmrg.environment import MovingEnvironment

t0 = time.time()
fd = FCIDUMP.parse("/root/reference/data/CR2.SVP.FCIDUMP")
tt = qc_term_table(fd)
mpo = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
target = (fd.n_elec, fd.twos, fd.ipg)
info = MPSInfo(mpo.group, mpo.site_quanta, target, D)
occs = np.loadtxt("/root/reference/data/CR2.SVP.OCC")
info.set_bond_dimension_using_occ(occs.ravel(), bias=2.0)
mps = MPS.random(info)
print(f"built t={time.time()-t0:.1f}s", flush=True)

me = MovingEnvironment(mpo, mps)
me.stacked = True
me.device_dtype = np.float32
me.stk_engine = "bucket"   # known-good engine to produce the state fast
n = mpo.n_sites
for t in range(n - 1, STOP - 1, -1):
    tb = time.time()
    ok = me._stk_contract(t, "right")
    print(f"bond {t}: ok={ok} dt={time.time()-tb:.1f}s", flush=True)
    assert ok

meta, pool = me._stk_r[STOP]
with open(f"/tmp/cr2_state_D{D}_b{STOP}.pkl", "wb") as f:
    pickle.dump({"groups": meta.groups, "sectors": meta.sectors,
                 "total": meta.total, "pool": np.asarray(pool),
                 "D": D, "stop": STOP}, f, protocol=4)
print(f"saved t={time.time()-t0:.1f}s", flush=True)
