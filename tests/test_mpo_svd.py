"""SVD-compressed MPO builder (reference MPOAlgorithmTypes::SVD,
src/dmrg/general_mpo.hpp:43-99): bond compression below the bipartite
cover for numerically low-rank long-range interactions, energy parity
with the bipartite MPO and ED."""

import numpy as np

from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.dmrg.mpo_builder import build_mpo, build_mpo_svd
from block2_preview_tpu.dmrg.mps import MPSInfo, MPS
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.utils.ed import ground_state_energy


def _longrange_fd(L=8, u=2.0):
    """Hubbard + exponentially decaying long-range hopping — a rank-1
    tail the bipartite cover cannot compress but SVD can."""
    h1e = np.zeros((L, L))
    for i in range(L):
        for j in range(L):
            if i != j:
                h1e[i, j] = -np.exp(-1.5 * abs(i - j))
    g2e = np.zeros((L, L, L, L))
    for i in range(L):
        g2e[i, i, i, i] = u
    return FCIDUMP(n_sites=L, n_elec=L, twos=0, ipg=0,
                   orb_sym=np.zeros(L, dtype=np.int64), const_e=0.0,
                   h1e=h1e, g2e=g2e)


def _solve(mpo, bond=100, seed=5):
    target = (mpo.n_sites, 0, 0)
    info = MPSInfo(mpo.group, mpo.site_quanta, target, bond)
    mps = MPS.random(info, seed=seed)
    d = DMRG(mpo, mps, iprint=0)
    return d.solve([bond], [1e-4, 1e-5, 0], [1e-10], n_sweeps=8, tol=1e-11)


def test_svd_mpo_exact_and_compressed():
    fd = _longrange_fd(8)
    tt = qc_term_table(fd)
    mpo_bp = build_mpo(tt, const_e=fd.const_e)
    mpo_svd = build_mpo_svd(tt, const_e=fd.const_e, svd_cutoff=1e-10)
    bd_bp = [len(d) for d in mpo_bp.bond_dqs]
    bd_svd = [len(d) for d in mpo_svd.bond_dqs]
    # the exponential hopping tail is low-rank: SVD strictly compresses
    assert max(bd_svd) < max(bd_bp), (bd_svd, bd_bp)
    e_ed = ground_state_energy(tt, fd.n_elec, fd.twos, fd.const_e)[0]
    e_bp = _solve(mpo_bp)
    e_svd = _solve(mpo_svd)
    assert abs(e_bp - e_ed) < 1e-8
    assert abs(e_svd - e_ed) < 1e-8, (e_svd, e_ed)


def test_svd_mpo_qc_parity():
    """On an exact-sparse QC deck the SVD MPO reproduces the bipartite
    energy (driver algo_type='svd')."""
    from block2_preview_tpu.driver.core import DMRGDriver
    drv = DMRGDriver()
    fd = drv.read_fcidump("/root/reference/tests/driver/FCIDUMP")
    mpo = drv.get_qc_mpo(fcidump=fd, algo_type="svd")
    gs = drv.get_random_mps(120, seed=3)
    e = drv.dmrg(mpo, gs, bond_dims=[120], noises=[1e-4, 1e-5, 0],
                 thrds=[1e-10], n_sweeps=8, tol=1e-11, iprint=0)
    assert abs(e - (-2.121631794832947)) < 1e-7
