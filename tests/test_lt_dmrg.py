"""Low-temperature DMRG (reference pyblock2/ltdmrg.py): multi-target
state-averaged roots with canonical Boltzmann weights.  Anchor: at
beta large enough that the lowest n_roots states carry the canonical
partition function, E(beta) matches the sector-restricted ED ensemble."""

import numpy as np

from block2_preview_tpu.core.expr import build_term_table, qc_raw_terms
from block2_preview_tpu.driver.core import DMRGDriver, SymmetryTypes
from block2_preview_tpu.models.hubbard import hubbard_fcidump
from block2_preview_tpu.utils.ed import sector_indices, term_table_to_sparse


def test_lt_dmrg_canonical_energy():
    L, beta, n_roots = 4, 4.0, 6
    fd = hubbard_fcidump(L, u=2.0, t=1.0)
    tt = build_term_table(L, qc_raw_terms(fd, cutoff=1e-13))
    h = term_table_to_sparse(tt)
    ix = sector_indices(L, 4, 0)
    w_all = np.linalg.eigvalsh(h[np.ix_(ix, ix)].toarray())
    bw = np.exp(-beta * (w_all - w_all.min()))
    e_full = float((bw * w_all).sum() / bw.sum())
    # the n_roots-truncated canonical ensemble LT-DMRG approximates
    bw_t = bw[:n_roots]
    e_ref = float((bw_t * w_all[:n_roots]).sum() / bw_t.sum())
    assert abs(e_ref - e_full) < 2e-4     # beta deep enough to be physical

    drv = DMRGDriver(SymmetryTypes.SZ)
    drv.initialize_system(L, 4, 0, orb_sym=np.zeros(L, dtype=int))
    mpo = drv.get_qc_mpo(fcidump=fd)
    ket = drv.get_random_mps(80, target=(4, 0, 0))
    e_beta, es, w = drv.lt_dmrg(
        mpo, ket, beta, [80] * 10, [1e-4] * 5 + [0] * 5, [1e-10] * 10,
        n_roots=n_roots, n_sweeps=10, tol=1e-11)
    assert np.abs(np.sort(es) - w_all[:n_roots]).max() < 1e-7
    assert abs(e_beta - e_ref) < 1e-6, (e_beta, e_ref)
