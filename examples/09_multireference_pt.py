"""Multireference perturbation theory & internally contracted CI.

DMRG-sc-NEVPT2: solve the frozen-core CAS with DMRG, pull spin-orbital
1-4 RDMs from the MPS, evaluate the 8 strongly contracted classes.
Then ic-MRCISD on the same system.
"""

import numpy as np

from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.driver.core import DMRGDriver
from block2_preview_tpu.icmr.icmrcisd import ic_mrcisd
from block2_preview_tpu.uc.mp import canonicalize_fcidump

fd = FCIDUMP.hubbard(5, t=1.0, u=2.0)
fd.n_elec, fd.twos = 6, 0
fd = canonicalize_fcidump(fd)    # canonical orbitals: sensible CAS
ncore, ncas = 1, 3

# CAS DMRG
cfd = DMRGDriver.get_cas_fcidump(fd, ncore, ncas)
mpo = build_mpo(qc_term_table(cfd), site_pgs=cfd.orb_sym,
                const_e=cfd.const_e)
info = MPSInfo(mpo.group, mpo.site_quanta,
               (cfd.n_elec, cfd.twos, cfd.ipg), 60)
dmrg = DMRG(mpo, MPS.random(info, seed=3), iprint=0)
e_cas = dmrg.solve([60] * 8, [1e-5] * 3 + [0] * 5, [1e-10], n_sweeps=8,
                   tol=1e-12)
print(f"E(CASCI, DMRG)   = {e_cas:.10f}")

res = DMRGDriver.sc_nevpt2(fd, ncore, ncas, cas_mps=dmrg.mps)
for cname, e in sorted(res.classes.items()):
    print(f"  {cname:8s} E2 = {e:+.10f}")
print(f"E2(sc-NEVPT2)    = {res.e2:+.10f}")
print(f"E(CAS + PT2)     = {e_cas + res.e2:.10f}")

e_ic, e_cas2, kept = ic_mrcisd(fd, ncore, ncas)
print(f"E(ic-MRCISD)     = {e_ic:.10f}   ({kept} contracted functions)")
