"""Big-site framework: determinant (Fock) big sites
(reference src/big_site/big_site.hpp, sci_fock_big_site.hpp SCIFockBigSite,
sweep_algorithm_big_site.hpp DMRGBigSite)."""

import numpy as np

from block2_preview_tpu.big_site import (fock_site_spec, grouped_site_specs,
                                         regroup_raw_terms)
from block2_preview_tpu.core.expr import (build_term_table, qc_raw_terms,
                                          qc_term_table)
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.core.symmetry import SZ_GROUP
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.utils.ed import sector_indices, term_table_to_sparse


def _solve_grouped(fd, groups, caps=None, bond_dim=80, target_twos=0,
                   **dmrg_kw):
    raw = qc_raw_terms(fd)
    grouped = regroup_raw_terms(raw, groups)
    specs = grouped_site_specs(groups, fd.orb_sym, caps=caps)
    tt = build_term_table(len(groups), grouped, group=SZ_GROUP, spec=specs)
    mpo = build_mpo(tt, site_pgs=[0] * len(groups), const_e=fd.const_e,
                    spec=specs)
    sq = [specs[t].quanta(0) for t in range(len(groups))]
    info = MPSInfo(SZ_GROUP, sq, (fd.n_elec, target_twos, 0), bond_dim)
    mps = MPS.random(info)
    return DMRG(mpo, mps, iprint=0, **dmrg_kw).solve(
        [bond_dim], [1e-4, 1e-5, 0], [1e-10], n_sweeps=10, tol=1e-10)


def test_fock_site_spec_algebra():
    """Elementary big-site ops obey the canonical anticommutators."""
    spec = fock_site_spec([0, 0])
    for u in range(2):
        for e in (0, 2):   # CRE_A, CRE_B
            c = spec.elem_mats[4 * u + e]
            d = spec.elem_mats[4 * u + e + 1]
            assert np.abs(c @ d + d @ c - np.eye(spec.dim)).max() < 1e-12
    # cross-orbital anticommutation
    c0 = spec.elem_mats[0]       # c+_a orb0
    c1 = spec.elem_mats[4]       # c+_a orb1
    assert np.abs(c0 @ c1 + c1 @ c0).max() < 1e-12


def test_big_site_hubbard_exact():
    """L=4 Hubbard with sites (0)(1)(2,3): energy equals full ED."""
    fd = FCIDUMP.hubbard(4, t=1.0, u=2.0)
    h = term_table_to_sparse(qc_term_table(fd))
    ix = sector_indices(4, 4, 0)
    e_ed = float(np.linalg.eigvalsh(h[np.ix_(ix, ix)].toarray())[0])
    e = _solve_grouped(fd, [[0], [1], [2, 3]])
    assert abs(e - e_ed) < 1e-9, (e, e_ed)


def test_big_site_three_orbitals():
    """L=6 Hubbard with the last three orbitals fused (dim-64 big site)."""
    fd = FCIDUMP.hubbard(6, t=1.0, u=4.0)
    h = term_table_to_sparse(qc_term_table(fd))
    ix = sector_indices(6, 6, 0)
    e_ed = float(np.linalg.eigvalsh(h[np.ix_(ix, ix)].toarray())[0])
    e = _solve_grouped(fd, [[0], [1], [2], [3, 4, 5]], bond_dim=120)
    assert abs(e - e_ed) < 1e-9, (e, e_ed)


def test_big_site_restricted_mrci_style():
    """Particle-number-restricted big site (<= 2 electrons among the last
    three orbitals), the uncontracted-MRCISD device: matches ED restricted
    to the same determinant space."""
    fd = FCIDUMP.hubbard(6, t=1.0, u=4.0)
    groups = [[0], [1], [2], [3, 4, 5]]
    caps = {3: (0, 2)}
    # restricted ED: project the sector onto determinants with
    # N(orbs 3-5) <= 2
    h = term_table_to_sparse(qc_term_table(fd))
    ix = sector_indices(6, 6, 0)
    from block2_preview_tpu.ops.local_ops import SZ_SITE
    n_state = [q[0] for q in SZ_SITE.quanta(0)]
    n_ext = []
    for state in ix:
        occ = []
        s = int(state)
        for _ in range(6):
            occ.append(s % 4)
            s //= 4
        occ = occ[::-1]   # site-major: first site = most significant
        n_ext.append(sum(n_state[o] for o in occ[3:]))
    keep = ix[np.array(n_ext) <= 2]
    e_ed = float(np.linalg.eigvalsh(h[np.ix_(keep, keep)].toarray())[0])
    e = _solve_grouped(fd, groups, caps=caps, bond_dim=120)
    assert abs(e - e_ed) < 1e-9, (e, e_ed)


def test_big_site_last_site_1site():
    """DMRGBigSite semantics (reference sweep_algorithm_big_site.hpp:44
    last_site_1site): in a two-site sweep the trailing big site gets a
    one-site update, so the big-site basis is never fused with the
    neighbor's physical dimension.  Energy parity with the plain two-dot
    big-site run and with ED restricted to the same space."""
    fd = FCIDUMP.hubbard(6, t=1.0, u=4.0)
    groups = [[0], [1], [2], [3, 4, 5]]
    caps = {3: (0, 2)}
    h = term_table_to_sparse(qc_term_table(fd))
    ix = sector_indices(6, 6, 0)
    from block2_preview_tpu.ops.local_ops import SZ_SITE
    n_state = [q[0] for q in SZ_SITE.quanta(0)]
    keep = []
    for state in ix:
        occ = []
        s = int(state)
        for _ in range(6):
            occ.append(s % 4)
            s //= 4
        occ = occ[::-1]
        if sum(n_state[o] for o in occ[3:]) <= 2:
            keep.append(state)
    keep = np.array(keep)
    e_ed = float(np.linalg.eigvalsh(h[np.ix_(keep, keep)].toarray())[0])
    e = _solve_grouped(fd, groups, caps=caps, bond_dim=120,
                       last_site_1site=True)
    assert abs(e - e_ed) < 1e-9, (e, e_ed)
