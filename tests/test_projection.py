"""State-specific projection DMRG (reference sweep_algorithm.hpp:81,110-111
ext_mpss / state_specific / projection_weights; block2main keywords
proj_mps_tags / proj_weights / statespecific)."""

import numpy as np

from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPSInfo, MPS
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.utils.ed import ground_state_energy

FD = "/root/reference/data/HUBBARD-L6.FCIDUMP"


def _setup(seed=1234, bond=80):
    fd = FCIDUMP.parse(FD)
    tt = qc_term_table(fd)
    mpo = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
    target = (fd.n_elec, fd.twos, fd.ipg)
    info = MPSInfo(mpo.group, mpo.site_quanta, target, bond)
    mps = MPS.random(info, seed=seed)
    e_ed = ground_state_energy(tt, fd.n_elec, fd.twos, fd.const_e, k=3)
    return mpo, mps, e_ed


def _solve(mpo, mps, n_sweeps=8, **kw):
    d = DMRG(mpo, mps, iprint=0, **kw)
    e = d.solve([80], [1e-4, 1e-5, 0], [1e-10], n_sweeps=n_sweeps,
                tol=1e-11)
    return d, float(np.atleast_1d(e)[0])


def test_projection_ortho_excited_state():
    mpo, mps, e_ed = _setup()
    d0, e0 = _solve(mpo, mps)
    assert abs(e0 - e_ed[0]) < 1e-8
    # re-optimize a fresh MPS with the ground state projected out
    _, mps1, _ = _setup(seed=777)
    d1, e1 = _solve(mpo, mps1, proj_mpss=[d0.mps])
    assert abs(e1 - e_ed[1]) < 1e-7


def test_projection_penalty_excited_state():
    mpo, mps, e_ed = _setup()
    d0, e0 = _solve(mpo, mps)
    gap = e_ed[2] - e_ed[0]
    _, mps1, _ = _setup(seed=999)
    d1, e1 = _solve(mpo, mps1, proj_mpss=[d0.mps],
                    proj_weights=[10.0 * gap], n_sweeps=12)
    assert abs(e1 - e_ed[1]) < 1e-6


def test_statespecific_refinement():
    """State-average then refine each root (block2main statespecific)."""
    mpo, mps, e_ed = _setup(bond=100)
    d = DMRG(mpo, mps, iprint=0, n_roots=2)
    d.solve([100], [1e-4, 1e-5, 0], [1e-10], n_sweeps=8, tol=1e-11)

    import copy

    def extract(r):
        m = copy.copy(d.mps)
        m.tensors = list(d.mps.tensors)
        m.tensors[d._center_pos] = d._center_tensors[r]
        return m

    roots = []
    energies = []
    for r in range(2):
        mr = extract(r)
        dr, er = _solve(mpo, mr, proj_mpss=roots or None)
        roots.append(dr.mps)
        energies.append(er)
    assert abs(energies[0] - e_ed[0]) < 1e-8
    assert abs(energies[1] - e_ed[1]) < 1e-7
