"""Fermionic SU(2) spin-adapted DMRG: Hubbard chains vs abelian ED
(reference SU2 universe: src/core/cg.hpp, src/dmrg/qc_hamiltonian.hpp SU2
site operators).  Also validates the graded coupled-product phase rule and
the creation/annihilation spinor reduced elements m-resolved."""

import numpy as np
import pytest

from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.su2_fermion import (MULTS, SITE_OPS, SQ2,
                                                 hubbard_su2_dmrg)
from block2_preview_tpu.utils.ed import sector_indices, term_table_to_sparse


def _ed(L, U, n_elec, tsz):
    fd = FCIDUMP.hubbard(L, t=1.0, u=U)
    h = term_table_to_sparse(qc_term_table(fd))
    ix = sector_indices(L, n_elec, tsz)
    hs = h[np.ix_(ix, ix)].toarray()
    return float(np.linalg.eigvalsh(hs)[0])


def test_su2_site_reduced_elements():
    """Wigner-Eckart consistency of the tabulated reduced elements against
    explicit 4-dim site matrices (|2> = c_up+ c_dn+ |0>)."""
    from block2_preview_tpu.core.clebsch_gordan import clebsch_gordan
    cu = np.zeros((4, 4)); cu[1, 0] = 1; cu[3, 2] = 1
    cd = np.zeros((4, 4)); cd[2, 0] = 1; cd[3, 1] = -1
    CRE = {1: cu, -1: cd}
    ANN = {1: cd.T, -1: -cu.T}
    states = {0: {0: 0}, 1: {1: 1, -1: 2}, 2: {0: 3}}
    for name, comp in (("C", CRE), ("D", ANN)):
        red, k, _dn = SITE_OPS[name]
        for mp, stp in states.items():
            for m, stm in states.items():
                jp, jm = MULTS[mp][1], MULTS[m][1]
                for tq in (-1, 1):
                    for tmm, ix in stm.items():
                        tmp = tmm + tq
                        if tmp not in stp:
                            continue
                        cg = clebsch_gordan(jm, k, jp, tmm, tq, tmp)
                        want = cg * red[mp, m]
                        got = comp[tq][stp[tmp], ix]
                        assert abs(got - want) < 1e-12, (name, mp, m, tq)


def test_su2_hubbard_l2_exact():
    d = hubbard_su2_dmrg(2, 1.0, 4.0, bond_dim=16)
    e = d.solve(n_sweeps=2)
    assert abs(e - (4 - np.sqrt(32)) / 2) < 1e-10


def test_su2_hubbard_l4():
    e_ed = _ed(4, 2.0, 4, 0)
    d = hubbard_su2_dmrg(4, 1.0, 2.0, bond_dim=60)
    e = d.solve(n_sweeps=6)
    assert abs(e - e_ed) < 1e-9, (e, e_ed)


def test_su2_hubbard_l6():
    e_ed = _ed(6, 4.0, 6, 0)
    d = hubbard_su2_dmrg(6, 1.0, 4.0, bond_dim=80)
    e = d.solve(n_sweeps=6)
    assert abs(e - e_ed) < 1e-9, (e, e_ed)


def test_su2_hubbard_doped():
    """Quarter filling: N=2 electrons on L=4."""
    e_ed = _ed(4, 3.0, 2, 0)
    d = hubbard_su2_dmrg(4, 1.0, 3.0, n_elec=2, bond_dim=60)
    e = d.solve(n_sweeps=6)
    assert abs(e - e_ed) < 1e-9, (e, e_ed)


def test_su2_hubbard_triplet():
    """Lowest S=1 state at half filling, L=4: equals the Sz=1-sector ED
    minimum (the singlet GS is excluded there)."""
    e_ed = _ed(4, 2.0, 4, 2)
    d = hubbard_su2_dmrg(4, 1.0, 2.0, twos=2, bond_dim=60)
    e = d.solve(n_sweeps=6)
    assert abs(e - e_ed) < 1e-9, (e, e_ed)


def test_su2_long_range_one_electron():
    """Arbitrary long-range t_ij + local U + site energies, several (N, S)
    targets incl. half-integer spin, vs sector ED."""
    from block2_preview_tpu.core.expr import build_term_table
    from block2_preview_tpu.dmrg.su2_fermion import (SU2FermionDMRG,
                                                     su2_one_electron_entries)
    from block2_preview_tpu.ops.local_ops import CRE_A, CRE_B, DES_A, DES_B
    rng = np.random.RandomState(2)
    Lx = 4
    t = rng.standard_normal((Lx, Lx)) * 0.7
    t = (t + t.T) / 2
    np.fill_diagonal(t, 0.0)
    eps = rng.standard_normal(Lx) * 0.3
    u = 1.5
    raw = []
    for i in range(Lx):
        for j in range(Lx):
            if i != j and abs(t[i, j]) > 0:
                raw.append((t[i, j], [(i, CRE_A), (j, DES_A)]))
                raw.append((t[i, j], [(i, CRE_B), (j, DES_B)]))
        raw.append((eps[i], [(i, CRE_A), (i, DES_A)]))
        raw.append((eps[i], [(i, CRE_B), (i, DES_B)]))
        raw.append((u, [(i, CRE_A), (i, DES_A), (i, CRE_B), (i, DES_B)]))
    h = term_table_to_sparse(build_term_table(Lx, raw))
    ents, nsym, dn = su2_one_electron_entries(t, u, eps)
    for (ne, tsz, tj) in ((4, 0, 0), (3, 1, 1), (4, 2, 2)):
        ix = sector_indices(Lx, ne, tsz)
        e_ed = float(np.linalg.eigvalsh(h[np.ix_(ix, ix)].toarray())[0])
        d = SU2FermionDMRG(Lx, ents, nsym, dn, target=(ne, tj), bond_dim=80)
        e = d.solve(n_sweeps=8)
        assert abs(e - e_ed) < 1e-9, (ne, tj, e, e_ed)


def test_su2_tiled_backend_parity():
    """SU(2) reduced-matrix sigma through the tiled accelerator executor
    (adapter in su2_fermion) matches the host solve exactly."""
    from block2_preview_tpu.dmrg.su2_fermion import (SU2FermionDMRG,
                                                     hubbard_su2_entries)
    e_ed = _ed(6, 2.0, 6, 0)
    entries, n_sym, dn = hubbard_su2_entries(1.0, 2.0)
    d = SU2FermionDMRG(6, entries, n_sym, dn, target=(6, 0),
                       bond_dim=80, backend="jax_tiled",
                       exec_dtype=np.float64)
    d.exec_threshold = 64     # force the tiled path at toy sizes
    import block2_preview_tpu.ops.tiled as tl
    calls = [0]
    orig = tl.TiledExecutor.__init__

    def spy(self, *a, **k):
        calls[0] += 1
        orig(self, *a, **k)

    tl.TiledExecutor.__init__ = spy
    try:
        e = d.solve(n_sweeps=6)
    finally:
        tl.TiledExecutor.__init__ = orig
    assert calls[0] > 0, "tiled path never engaged"
    assert abs(e - e_ed) < 1e-8, (e, e_ed)
