"""AQCC/ACPF big-site sweeps vs self-consistent shifted ED (reference
sweep_algorithm_big_site.hpp:292 DMRGBigSiteAQCC)."""

import numpy as np
import pytest

from block2_preview_tpu.big_site import _gfactor, big_site_aqcc
from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.utils.ed import sector_indices, term_table_to_sparse

N_STATE = [0, 1, 1, 2]


def _shifted_ed(fd, ext_orbs, max_ext, g, e_ref, n_outer=12):
    h = term_table_to_sparse(qc_term_table(fd))
    ix = sector_indices(fd.n_sites, fd.n_elec, fd.twos)
    nset = set(ext_orbs)
    rows, pdiag = [], []
    for state in ix:
        occ = []
        s = int(state)
        for _ in range(fd.n_sites):
            occ.append(s % 4)
            s //= 4
        occ = occ[::-1]
        ns = [N_STATE[o] for o in occ]
        next_ = sum(ns[o] for o in ext_orbs)
        if next_ <= max_ext:
            rows.append(state)
            pdiag.append(1.0 if next_ > 0 else 0.0)
    rows = np.asarray(rows)
    hd = h[np.ix_(rows, rows)].toarray()
    P = np.diag(pdiag)
    sigma = 0.0
    for _ in range(n_outer):
        w, v = np.linalg.eigh(hd + sigma * P)
        e_shift = w[0]
        pexp = float(v[:, 0] @ (P @ v[:, 0]))
        e = e_shift - sigma * pexp + fd.const_e
        sigma = (1 - g) * (e - e_ref)
    return e, sigma


@pytest.mark.parametrize("method", ["cisd", "acpf", "aqcc"])
def test_aqcc_vs_shifted_ed(method):
    fd = FCIDUMP.hubbard(6, t=1.0, u=3.0)
    groups = [[0], [1], [2], [3, 4, 5]]
    caps = {3: (0, 2)}
    e, sigma = big_site_aqcc(fd, groups, caps, bond_dim=120,
                             method=method)
    # reference space: big site empty
    eref_ed, _ = _shifted_ed(fd, [3, 4, 5], 0, 0.0, 0.0, n_outer=1)
    g = _gfactor(method, fd.n_elec)
    e_ed, _ = _shifted_ed(fd, [3, 4, 5], 2, g, eref_ed)
    assert abs(e - e_ed) < 1e-7, (method, e, e_ed)


def test_aqcc_ordering():
    """ACPF/AQCC lie below plain MRCI (partial size-consistency
    correction lowers the energy when E_corr < 0)."""
    fd = FCIDUMP.hubbard(6, t=1.0, u=3.0)
    groups = [[0], [1], [2], [3, 4, 5]]
    caps = {3: (0, 2)}
    e_ci, _ = big_site_aqcc(fd, groups, caps, bond_dim=120,
                            method="cisd")
    e_acpf, _ = big_site_aqcc(fd, groups, caps, bond_dim=120,
                              method="acpf")
    e_aqcc, _ = big_site_aqcc(fd, groups, caps, bond_dim=120,
                              method="aqcc")
    assert e_acpf < e_ci + 1e-9
    assert e_aqcc < e_ci + 1e-9
