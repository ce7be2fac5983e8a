"""MPS checkpoint / restart tests (reference restart_dir + load_mps tier)."""

import numpy as np

from block2_preview_tpu.dmrg.expect import mpo_expectation, mps_overlap
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.driver.core import DMRGDriver
from block2_preview_tpu.utils.io import load_mps, save_mps


def test_save_load_roundtrip(tmp_path):
    drv = DMRGDriver()
    fd = drv.read_fcidump("/root/reference/tests/driver/FCIDUMP")
    mpo = drv.get_qc_mpo(fcidump=fd)
    mps = drv.get_random_mps(100, seed=2)
    e = DMRG(mpo, mps, iprint=0).solve([100], [1e-4, 0], [1e-10],
                                       n_sweeps=5, tol=1e-11)
    p = str(tmp_path / "ket.npz")
    save_mps(mps, p)
    mps2 = load_mps(p)
    assert abs(mps_overlap(mps2, mps) - mps_overlap(mps, mps)) < 1e-12
    e2 = mpo_expectation(mpo, mps2) / mps_overlap(mps2, mps2)
    assert abs(e2 - e) < 1e-8


def test_restart_continues(tmp_path):
    drv = DMRGDriver()
    fd = drv.read_fcidump("/root/reference/tests/driver/FCIDUMP")
    mpo = drv.get_qc_mpo(fcidump=fd)
    mps = drv.get_random_mps(100, seed=2)
    d = DMRG(mpo, mps, iprint=0)
    d.solve([100], [1e-4], [1e-8], n_sweeps=2, tol=0,
            restart_dir=str(tmp_path))
    mps2 = load_mps(str(tmp_path / "mps.KET.npz"))
    d2 = DMRG(mpo, mps2, iprint=0)
    e = d2.solve([100], [1e-5, 0], [1e-10], n_sweeps=5, tol=1e-11)
    assert abs(e - (-2.121631829534)) < 1e-8


def test_disk_backed_environments(tmp_path):
    """Disk-spilled environment partitions (reference
    Partition::save_data partition.hpp:93): energy parity with the
    RAM-resident run, and spill files actually created."""
    import os
    from block2_preview_tpu.core.expr import qc_term_table
    from block2_preview_tpu.core.fcidump import FCIDUMP
    from block2_preview_tpu.dmrg.mpo_builder import build_mpo
    from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
    from block2_preview_tpu.dmrg.sweep import DMRG

    fd = FCIDUMP.parse("/root/reference/data/HUBBARD-L8.FCIDUMP")
    tt = qc_term_table(fd)
    mpo = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
    info = MPSInfo(mpo.group, mpo.site_quanta,
                   (fd.n_elec, fd.twos, fd.ipg), 100)
    e_ref = DMRG(mpo, MPS.random(info, seed=3), iprint=0).solve(
        [100], [1e-4, 1e-5, 0], [1e-10], n_sweeps=6, tol=1e-11)
    info2 = MPSInfo(mpo.group, mpo.site_quanta,
                    (fd.n_elec, fd.twos, fd.ipg), 100)
    d = DMRG(mpo, MPS.random(info2, seed=3), iprint=0,
             env_disk_dir=str(tmp_path), env_disk_window=1)
    e_disk = d.solve([100], [1e-4, 1e-5, 0], [1e-10], n_sweeps=6,
                     tol=1e-11)
    assert abs(e_disk - e_ref) < 1e-10
    assert any(f.startswith("env_") for f in os.listdir(tmp_path))


def test_fix_restarting_mps():
    """Canonical-form repair on restart (reference core.py:7100
    fix_restarting_mps): a gauge-corrupted checkpoint is repaired
    state-preservingly — the energy expectation survives and a restarted
    DMRG converges immediately."""
    import numpy as np

    from block2_preview_tpu.core.expr import qc_term_table
    from block2_preview_tpu.core.fcidump import FCIDUMP
    from block2_preview_tpu.dmrg.expect import mpo_expectation, mps_overlap
    from block2_preview_tpu.dmrg.mpo_builder import build_mpo
    from block2_preview_tpu.dmrg.mps import MPS, MPSInfo, MPSTensor
    from block2_preview_tpu.dmrg.sweep import DMRG
    from block2_preview_tpu.utils.io import fix_restarting_mps

    fd = FCIDUMP.hubbard(6, t=1.0, u=2.0)
    tt = qc_term_table(fd)
    mpo = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
    info = MPSInfo(mpo.group, mpo.site_quanta, (6, 0, 0), 100)
    mps = MPS.random(info, seed=3)
    dmrg = DMRG(mpo, mps, iprint=0)
    e_ref = dmrg.solve([100], [1e-4, 1e-5, 0], [1e-10], n_sweeps=8,
                       tol=1e-11)

    # state-preserving gauge corruption across bond (2,3): scale + mix
    rng = np.random.RandomState(0)
    t2, t3 = mps.tensors[2], mps.tensors[3]
    gmats = {}
    for (ql, qp, qr), b in t2.blocks.items():
        if qr not in gmats:
            d = b.shape[2]
            g = np.eye(d) * 3.0 + 0.3 * rng.standard_normal((d, d))
            gmats[qr] = g
    nb2 = {k: np.einsum("lpr,rx->lpx", b, gmats[k[2]])
           for k, b in t2.blocks.items()}
    nb3 = {k: np.einsum("xl,lpr->xpr", np.linalg.inv(gmats[k[0]]), b)
           for k, b in t3.blocks.items() if k[0] in gmats}
    mps.tensors[2] = MPSTensor(mps.group, nb2)
    mps.tensors[3] = MPSTensor(mps.group, nb3)
    mps.center = 0   # stored center now inconsistent with the gauge

    fix_restarting_mps(mps)
    nrm = float(np.real(mps_overlap(mps, mps)))
    assert abs(nrm - 1.0) < 1e-10
    e_fixed = float(np.real(mpo_expectation(mpo, mps))) / nrm
    assert abs(e_fixed - e_ref) < 1e-9, (e_fixed, e_ref)
    # restart converges in one pass
    d2 = DMRG(mpo, mps, iprint=0)
    e2 = d2.solve([100], [0], [1e-10], n_sweeps=2, tol=1e-12)
    assert abs(e2 - e_ref) < 1e-9
