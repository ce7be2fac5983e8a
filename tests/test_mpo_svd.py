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


def test_svd_mpo_variants():
    """Rescaled/Constrained/Disjoint SVD modes (reference
    MPOAlgorithmTypes, general_mpo.hpp:43-99): all reach the same ground
    state; disjoint factors keep single-component support; constrained
    factors are sparser at equal rank; rescaled matches plain at a
    rescaled threshold."""
    fd = _longrange_fd(8)
    tt = qc_term_table(fd)
    e_ed = ground_state_energy(tt, fd.n_elec, fd.twos, fd.const_e)[0]
    # a slack l1/l2 bound (>= sqrt(max block width)) leaves the POCS
    # factorization exact; a binding one trades accuracy for sparsity
    for variant, kw in (("rescaled", {}),
                        ("constrained", {"csvd_sparsity": 64.0}),
                        ("disjoint", {})):
        mpo = build_mpo_svd(tt, const_e=fd.const_e, svd_cutoff=1e-10,
                            variant=variant, **kw)
        e = _solve(mpo)
        assert abs(e - e_ed) < 1e-8, (variant, e, e_ed)
    # binding sparsity trades accuracy for sparser factors: the fraction
    # of near-zero entries in the bond-coefficient factors must rise
    def _nnz_frac(mpo):
        tot = nz = 0
        for w in mpo.tensors:
            for m in w.values():
                tot += m.size
                nz += int((np.abs(m) > 1e-10).sum())
        return nz / tot
    mpo_sp = build_mpo_svd(tt, const_e=fd.const_e, svd_cutoff=1e-10,
                           variant="constrained", csvd_sparsity=2.5)
    mpo_pl = build_mpo_svd(tt, const_e=fd.const_e, svd_cutoff=1e-10)
    assert _nnz_frac(mpo_sp) < _nnz_frac(mpo_pl)


def test_svd_mpo_max_bond_dim():
    """max_bond_dim caps the kept singular values per sector
    (general_mpo.hpp:805-807): bond dims shrink, energy degrades
    gracefully (still variational, approximate Hamiltonian)."""
    fd = _longrange_fd(8)
    tt = qc_term_table(fd)
    full = build_mpo_svd(tt, const_e=fd.const_e, svd_cutoff=1e-10)
    capped = build_mpo_svd(tt, const_e=fd.const_e, svd_cutoff=1e-10,
                           max_bond_dim=1)
    assert sum(len(d) for d in capped.bond_dqs) < \
        sum(len(d) for d in full.bond_dqs)


def test_driver_svd_variants():
    from block2_preview_tpu.driver.core import DMRGDriver
    drv = DMRGDriver()
    fd = drv.read_fcidump("/root/reference/tests/driver/FCIDUMP")
    b = drv.expr_builder()
    tt = qc_term_table(fd)
    for at in ("rescaled_svd", "disjointSVD"):
        mpo = drv.get_mpo(tt, const_e=fd.const_e, algo_type=at)
        gs = drv.get_random_mps(120, seed=3)
        e = drv.dmrg(mpo, gs, bond_dims=[120], noises=[1e-4, 1e-5, 0],
                     thrds=[1e-10], n_sweeps=8, tol=1e-11, iprint=0)
        assert abs(e - (-2.121631794832947)) < 1e-7, (at, e)
