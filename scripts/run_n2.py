import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), _os.pardir)))
import sys
import time

import numpy as np

from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.dmrg.sweep import DMRG

t0 = time.time()
fd = FCIDUMP.parse("/root/reference/data/N2.STO3G.FCIDUMP")
tt = qc_term_table(fd)
mpo = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
target = (fd.n_elec, fd.twos, fd.ipg)
D = int(sys.argv[1]) if len(sys.argv) > 1 else 500
backend = sys.argv[2] if len(sys.argv) > 2 else "numpy"
info = MPSInfo(mpo.group, mpo.site_quanta, target, D)
mps = MPS.random(info)
dmrg = DMRG(mpo, mps, backend=backend, iprint=1)
e = dmrg.solve([250, D], [1e-4, 1e-5, 1e-5, 0], [1e-10], n_sweeps=12, tol=1e-10)
ref = -107.654122447525
print("FINAL %.12f  ref %.12f  err %.2e  t=%.1fs"
      % (e, ref, e - ref, time.time() - t0))
