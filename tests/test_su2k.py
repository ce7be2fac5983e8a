"""SU2K: SU(2) spin adaptation combined with mod-N momentum labels
(reference symmetry.hpp:1313 SU2KLong — the SU2K quantum-number family).
The SU(2) engine's pg labels compose by mod-N addition (pg_mod=N)
instead of XOR; anchored against momentum- and spin-resolved ED of the
k-space Hubbard model."""

import numpy as np
import pytest

from block2_preview_tpu.core.expr import (build_term_table, qc_raw_terms,
                                          spin_square_raw_terms)
from block2_preview_tpu.dmrg.su2_fermion import SU2FermionDMRG
from block2_preview_tpu.dmrg.su2_qc import (compile_su2_entries,
                                            qc_su2_term_table)
from block2_preview_tpu.models.hubbard import hubbard_kspace
from block2_preview_tpu.utils.ed import sector_indices, term_table_to_sparse


def _sector_spin_ed(fd, L, nel, k, twos):
    """Lowest eigenvalue in the (N=nel, momentum=k, S=twos/2) sector
    (degeneracy-safe: diagonalize H inside the S^2 eigenspace)."""
    raw = qc_raw_terms(fd, cutoff=1e-13, pg_mode=L)
    tt = build_term_table(L, raw)
    h = term_table_to_sparse(tt)
    ix = sector_indices(L, nel, 0)
    hs = h[np.ix_(ix, ix)].toarray()
    s2 = term_table_to_sparse(build_term_table(
        L, spin_square_raw_terms(L)))[np.ix_(ix, ix)].toarray()

    def mom(det_idx):
        tot = 0
        for t in range(L):
            d = (det_idx // (4 ** (L - 1 - t))) % 4
            tot += t * (1 if d in (1, 2) else (2 if d == 3 else 0))
        return tot % L

    moms = np.array([mom(int(i)) for i in ix])
    sel = np.nonzero(moms == k)[0]
    ssub = s2[np.ix_(sel, sel)]
    w2, v2 = np.linalg.eigh(0.5 * (ssub + ssub.T))
    s = twos / 2.0
    keep = np.abs(w2 - s * (s + 1)) < 1e-8
    if not np.any(keep):
        return None
    P = v2[:, keep]
    hp = P.T @ hs[np.ix_(sel, sel)] @ P
    return float(np.linalg.eigvalsh(0.5 * (hp + hp.T))[0])


@pytest.mark.parametrize("L,nel", [(3, 2), (4, 4)])
def test_su2k_hubbard_momentum_sectors(L, nel):
    fd, group, site_quanta, target = hubbard_kspace(L, u=2.0, t=1.0,
                                                    n_elec=nel)
    stt = qc_su2_term_table(fd.h1e, fd.g2e, 0.0)
    entries, n_sym, sym_dn, sym_rank, registry = compile_su2_entries(stt)
    for k in range(L):
        for twos in (0, 2):
            ref = _sector_spin_ed(fd, L, nel, k, twos)
            if ref is None:
                continue
            eng = SU2FermionDMRG(
                L, entries, n_sym, sym_dn, target=(nel, twos, k),
                bond_dim=100, iprint=0, ops=registry, ranks=sym_rank,
                site_pgs=list(range(L)), pg_mod=L)
            e = eng.solve(n_sweeps=10, tol=1e-10,
                          noises=[1e-4, 1e-5, 0], dav_thrds=[1e-10])
            assert abs(e - ref) < 1e-8, (L, k, twos, e, ref)
