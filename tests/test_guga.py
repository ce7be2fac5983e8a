"""GUGA DRT / CSF machinery (reference drt_big_site.hpp, csf_big_site.hpp)."""

import numpy as np
import pytest

from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.guga import (CSFSpace, DRT, csf_to_determinants,
                                          weyl_paldus_dim)
from block2_preview_tpu.utils.ed import sector_indices, term_table_to_sparse


@pytest.mark.parametrize("n,ne,tw", [
    (2, 2, 0), (3, 2, 2), (4, 4, 0), (4, 4, 2), (5, 4, 0), (6, 6, 0),
    (5, 6, 2), (6, 5, 1), (6, 5, 3),
])
def test_drt_counts_weyl(n, ne, tw):
    drt = DRT(n, ne, tw)
    assert drt.n_csf == weyl_paldus_dim(n, ne, tw)
    assert len(drt.csfs()) == drt.n_csf


def test_csf_expansion_orthonormal_and_spin_pure():
    n, ne, tw = 4, 4, 0
    sp = CSFSpace(n, ne, tw)
    C, dets = sp.expansion()
    # orthonormal
    G = C.T @ C
    assert np.allclose(G, np.eye(sp.n_csf), atol=1e-10)
    # spin purity: S^2 via S-S+ + Sz(Sz+1) on determinant space
    # simpler: total Sz of every determinant in the expansion = S
    from block2_preview_tpu.ops.local_ops import SZ_SITE
    q = SZ_SITE.quanta(0)
    for det in dets:
        assert sum(q[p][1] for p in det) == tw
        assert sum(q[p][0] for p in det) == ne


@pytest.mark.parametrize("n,ne,tw", [(4, 4, 0), (4, 4, 2), (5, 4, 0)])
def test_csf_hamiltonian_spectrum(n, ne, tw):
    """CSF-basis H reproduces exactly the spin-S eigenvalues of the
    determinant-sector Hamiltonian (spin-pure CASCI)."""
    rng = np.random.RandomState(7)
    h1 = rng.standard_normal((n, n))
    h1 = 0.5 * (h1 + h1.T)
    g2 = rng.standard_normal((n, n, n, n)) * 0.2
    g2 = g2 + g2.transpose(1, 0, 2, 3)
    g2 = g2 + g2.transpose(0, 1, 3, 2)
    g2 = g2 + g2.transpose(2, 3, 0, 1)
    fd = FCIDUMP(n_sites=n, n_elec=ne, twos=tw, ipg=0, orb_sym=None,
                 h1e=h1, g2e=0.125 * g2, const_e=0.0)
    sp = CSFSpace(n, ne, tw)
    hc = sp.hamiltonian(fd)
    w_csf = np.sort(np.linalg.eigvalsh(hc))
    # determinant sector (Sz = S) spectrum contains all S' >= S states;
    # the S-pure subset is exactly the CSF spectrum: compare against the
    # difference of Sz=S and Sz=S+1 sectors
    h = term_table_to_sparse(qc_term_table(fd))
    ix0 = sector_indices(n, ne, tw)
    w0 = np.sort(np.linalg.eigvalsh(h[np.ix_(ix0, ix0)].toarray()))
    ix1 = sector_indices(n, ne, tw + 2)
    w1 = np.sort(np.linalg.eigvalsh(h[np.ix_(ix1, ix1)].toarray())) \
        if len(ix1) else np.zeros(0)
    # multiset difference w0 \ w1 = spin-S eigenvalues
    rem = list(w1)
    pure = []
    for x in w0:
        hit = next((i for i, y in enumerate(rem) if abs(x - y) < 1e-9),
                   None)
        if hit is None:
            pure.append(x)
        else:
            rem.pop(hit)
    pure = np.asarray(sorted(pure))
    assert len(pure) == sp.n_csf
    assert np.allclose(pure, w_csf, atol=1e-8)
