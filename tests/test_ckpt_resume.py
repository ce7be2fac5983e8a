"""Cross-process sweep checkpoint/resume (scripts/run_cr2.py pattern;
reference restart_dir / startM restart family, block2main parser.py).

A DMRG run interrupted after k sweeps and resumed from the saved MPS in
a FRESH process (re-gauged to center 0, forward restart) must continue
descending and land on the same converged energy as an uninterrupted
run.
"""

import numpy as np

from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.utils.io import load_mps, save_mps


def test_sweep_checkpoint_resume(tmp_path):
    fd = FCIDUMP.parse("/root/reference/data/HUBBARD-L8.FCIDUMP")
    tt = qc_term_table(fd)
    mpo = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
    target = (fd.n_elec, fd.twos, fd.ipg)

    def fresh_mps():
        info = MPSInfo(mpo.group, mpo.site_quanta, target, 80)
        return MPS.random(info, seed=11)

    # uninterrupted reference: 6 sweeps in one engine
    e_ref = DMRG(mpo, fresh_mps(), iprint=0).solve(
        [80], [1e-4, 1e-5, 0], [1e-9], n_sweeps=6, tol=0)

    # leg 1: 3 per-sweep solve() calls (direction alternates via the
    # engine's center state), checkpoint after each
    dmrg = DMRG(mpo, fresh_mps(), iprint=0)
    for isw in range(3):
        noise = [1e-4, 1e-5, 0][min(isw, 2)]
        e1 = dmrg.solve([80], [noise], [1e-9], n_sweeps=1, tol=0)
        save_mps(dmrg.mps, str(tmp_path / "ck.mps.npz"))

    # leg 2: fresh process analog — reload, re-gauge to center 0,
    # rebuild the engine, run the remaining sweeps
    mps2 = load_mps(str(tmp_path / "ck.mps.npz"))
    mps2.canonicalize()
    dmrg2 = DMRG(mpo, mps2, iprint=0)
    e2 = None
    for isw in range(3, 6):
        e2 = dmrg2.solve([80], [0], [1e-9], n_sweeps=1, tol=0)

    assert e2 <= e1 + 1e-10          # resume continues descending
    assert abs(e2 - e_ref) < 1e-8    # same converged energy
