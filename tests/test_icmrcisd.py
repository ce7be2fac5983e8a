"""ic-MRCISD anchors (reference pyblock2/icmr/icmrcisd_full.py):
ncas=0 reduces exactly to CISD; variational ordering in the general case."""

import numpy as np
import pytest

from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.icmr.icmrcisd import ic_mrcisd
from block2_preview_tpu.utils.ed import sector_indices, term_table_to_sparse
from tests.test_scnevpt2 import _rand_fd

N_STATE = [0, 1, 1, 2]


def _truncated_ed(fd, ncore, ncas, order=2):
    """Uncontracted MRCISD: determinants within `order` external
    excitations of the (core-filled, virt-empty) CAS class."""
    h = term_table_to_sparse(qc_term_table(fd))
    ix = sector_indices(fd.n_sites, fd.n_elec, fd.twos)
    rows = []
    for state in ix:
        occ = []
        s = int(state)
        for _ in range(fd.n_sites):
            occ.append(s % 4)
            s //= 4
        occ = occ[::-1]
        ns = [N_STATE[o] for o in occ]
        nholes = 2 * ncore - sum(ns[:ncore])
        nvirt = sum(ns[ncore + ncas:])
        if max(nholes, nvirt) <= order and nholes + nvirt <= 2 * order:
            if nholes <= order and nvirt <= order \
                    and (nholes + nvirt) <= 2 * order:
                rows.append(state)
    rows = np.asarray(rows)
    w = np.linalg.eigvalsh(h[np.ix_(rows, rows)].toarray())
    return w[0] + fd.const_e


def test_icmrcisd_cisd_limit():
    """Empty active space: internally contracted == plain CISD == ED in
    the excitation-truncated space."""
    fd = _rand_fd(4, 4, seed=3, u=0.5)
    e_ic, e_cas, kept = ic_mrcisd(fd, 2, 0)
    e_ref = _truncated_ed(fd, 2, 0)
    assert abs(e_ic - e_ref) < 1e-8, (e_ic, e_ref)


def test_icmrcisd_variational_window():
    fd = _rand_fd(4, 4, seed=9, u=0.5)
    ncore, ncas = 1, 2
    e_ic, e_cas, kept = ic_mrcisd(fd, ncore, ncas)
    e_unc = _truncated_ed(fd, ncore, ncas)
    # full FCI in the sector
    h = term_table_to_sparse(qc_term_table(fd))
    ix = sector_indices(4, 4, 0)
    e_fci = np.linalg.eigvalsh(h[np.ix_(ix, ix)].toarray())[0] \
        + fd.const_e
    assert e_cas >= e_ic - 1e-9
    assert e_ic >= e_unc - 1e-8
    assert e_unc >= e_fci - 1e-9
    # contraction should recover most of the correlation (random
    # Hamiltonians are a worst case for internal contraction)
    assert (e_cas - e_ic) / max(e_cas - e_unc, 1e-12) > 0.85
