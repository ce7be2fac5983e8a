"""Single-reference CI via big sites (uncontracted CISD/CISDT/...).

TPU-native counterpart of the reference's big-site CI driver
(reference pyblock2/ci.py: CSFBigSite(n_inactive, order, False) |
CSFBigSite(n_external, order, True) two-site chain solved by one exact
DMRG sweep).  Here the SZ determinant big sites carry the windows: the
occupied orbitals become ONE site with >= 2*nocc - order electrons and
the virtuals ONE site with <= order electrons; N conservation couples
the two windows, so the 2-site DMRG space is exactly the CI(order)
space.  bond_dim caps the variational approximation (set it large for
the exact CI energy)."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..big_site import grouped_site_specs, regroup_raw_terms
from ..core.expr import build_term_table, qc_raw_terms
from ..core.fcidump import FCIDUMP
from ..core.symmetry import SZ_GROUP
from ..dmrg.mpo_builder import build_mpo
from ..dmrg.mps import MPS, MPSInfo
from ..dmrg.sweep import DMRG


def ci_energy(fd: FCIDUMP, ci_order: int = 2,
              nocc: Optional[int] = None, bond_dim: int = 2000,
              n_sweeps: int = 8, tol: float = 1e-10,
              iprint: int = 0, seed: int = 7) -> float:
    """CI(ci_order) ground-state energy of a closed-shell reference:
    ci_order = 2 -> CISD, 3 -> CISDT, ...; nocc defaults to
    n_elec // 2 (the orbitals must be ordered occupied-first, as a
    canonicalized RHF FCIDUMP is)."""
    if nocc is None:
        assert fd.n_elec % 2 == 0, "open shell: pass nocc explicitly"
        nocc = fd.n_elec // 2
    L = fd.n_sites
    assert 0 < nocc < L
    groups = [list(range(nocc)), list(range(nocc, L))]
    caps = {0: (max(0, 2 * nocc - ci_order), 2 * nocc),
            1: (0, min(ci_order, 2 * (L - nocc)))}
    raw = regroup_raw_terms(qc_raw_terms(fd), groups)
    specs = grouped_site_specs(groups, fd.orb_sym, caps=caps)
    tt = build_term_table(2, raw, group=SZ_GROUP, spec=specs)
    mpo = build_mpo(tt, site_pgs=[0, 0], const_e=fd.const_e, spec=specs)
    sq = [specs[t].quanta(0) for t in range(2)]
    info = MPSInfo(SZ_GROUP, sq, (fd.n_elec, fd.twos, fd.ipg), bond_dim)
    mps = MPS.random(info, seed=seed)
    return DMRG(mpo, mps, iprint=iprint).solve(
        [bond_dim], [1e-4, 1e-5, 0], [tol], n_sweeps=n_sweeps,
        tol=tol)


class CI:
    """Driver-style surface mirroring the reference pyblock2/ci.py CI
    class (pyscf-free: integrals come from an FCIDUMP)."""

    def __init__(self, fcidump: FCIDUMP, ci_order: int = 2,
                 nocc: Optional[int] = None, e_ref: Optional[float] = None):
        self.fcidump = fcidump
        self.ci_order = ci_order
        self.nocc = nocc
        self.e_ref = e_ref          # HF/reference energy for e_corr
        self.e_tot = None
        self.e_corr = None
        self.converged = False

    def kernel(self, bond_dim: int = 2000, **kw) -> float:
        self.e_tot = ci_energy(self.fcidump, ci_order=self.ci_order,
                               nocc=self.nocc, bond_dim=bond_dim, **kw)
        if self.e_ref is not None:
            self.e_corr = self.e_tot - self.e_ref
        self.converged = True
        return self.e_tot
