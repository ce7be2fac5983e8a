"""End-to-end N2/STO-3G parity run used by bench.py (host f64)."""

import time

import numpy as np


def run_parity():
    from block2_preview_tpu.core.expr import qc_term_table
    from block2_preview_tpu.core.fcidump import FCIDUMP
    from block2_preview_tpu.dmrg.mpo_builder import build_mpo
    from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
    from block2_preview_tpu.dmrg.sweep import DMRG

    fd = FCIDUMP.parse("/root/reference/data/N2.STO3G.FCIDUMP")
    tt = qc_term_table(fd)
    mpo = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
    target = (fd.n_elec, fd.twos, fd.ipg)
    info = MPSInfo(mpo.group, mpo.site_quanta, target, 250)
    mps = MPS.random(info)
    dmrg = DMRG(mpo, mps, iprint=0)
    t0 = time.time()
    e = dmrg.solve([250], [1e-4, 1e-5, 1e-5, 0.0], [1e-10],
                   n_sweeps=8, tol=1e-9)
    return e, time.time() - t0
