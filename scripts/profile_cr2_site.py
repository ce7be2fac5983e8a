"""Profile the first few Cr2 site updates to locate the overhead."""

import cProfile
import pstats
import sys
import time

import numpy as np

from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.dmrg.sweep import DMRG

backend = sys.argv[1] if len(sys.argv) > 1 else "jax_stacked"
n_step = int(sys.argv[2]) if len(sys.argv) > 2 else 6

t0 = time.time()
fd = FCIDUMP.parse("/root/reference/data/CR2.SVP.FCIDUMP")
tt = qc_term_table(fd)
mpo = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
print("build t=%.1fs" % (time.time() - t0), flush=True)

info = MPSInfo(mpo.group, mpo.site_quanta, (fd.n_elec, fd.twos, fd.ipg), 250)
occs = np.loadtxt("/root/reference/data/CR2.SVP.OCC")
info.set_bond_dimension_using_occ(occs.ravel(), bias=2.0)
mps = MPS.random(info)
dmrg = DMRG(mpo, mps, backend=backend, dtype=np.float32, iprint=2,
            dav_max_iter=30)

pr = cProfile.Profile()
pr.enable()
for t in range(n_step):
    ts = time.time()
    e, dw, nmv = dmrg.update_two_dot(t, True, 250, 1e-4, 1e-4)
    print(f"site {t}: E={e[0]+mpo.const_e:.6f} nmv={nmv} "
          f"t={time.time()-ts:.1f}s", flush=True)
pr.disable()
st = pstats.Stats(pr)
st.sort_stats("cumulative").print_stats(35)
