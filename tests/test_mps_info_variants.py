"""CASCI/MRCI MPSInfo bond structures (reference mps.hpp:1293/1400).

The restriction must hold through the full sweep (decimation filter),
so the DMRG energy equals ED restricted to the same determinant space.
"""

import numpy as np

from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.utils.ed import sector_indices, term_table_to_sparse

N_STATE = [0, 1, 1, 2]


def _restricted_ed(fd, keep_fn):
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
        if keep_fn([N_STATE[o] for o in occ]):
            rows.append(state)
    rows = np.asarray(rows)
    return float(np.linalg.eigvalsh(h[np.ix_(rows, rows)].toarray())[0]) \
        + fd.const_e


def _dmrg_energy(fd, info, sweeps=8):
    tt = qc_term_table(fd)
    mpo = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
    mps = MPS.random(info, seed=3)
    dmrg = DMRG(mpo, mps, iprint=0)
    return dmrg.solve([info.bond_dim] * sweeps, [1e-5] * 3 + [0] * 5,
                      [1e-10], n_sweeps=sweeps, tol=1e-12)


def test_mrci_mps_info():
    fd = FCIDUMP.hubbard(6, t=1.0, u=4.0)
    n_ext, order = 3, 2
    e_ed = _restricted_ed(
        fd, lambda ns: sum(ns[-n_ext:]) <= order)
    tt = qc_term_table(fd)
    mpo = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
    info = MPSInfo.mrci(mpo.group, mpo.site_quanta,
                        (fd.n_elec, fd.twos, fd.ipg), 150,
                        n_ext=n_ext, ci_order=order)
    e = _dmrg_energy(fd, info)
    assert abs(e - e_ed) < 1e-9, (e, e_ed)
    # and the restriction makes it differ from full FCI
    e_fci = _restricted_ed(fd, lambda ns: True)
    assert e_ed > e_fci + 1e-6


def test_casci_mps_info():
    fd = FCIDUMP.hubbard(6, t=1.0, u=2.0)
    ni, nv = 1, 1
    e_ed = _restricted_ed(
        fd, lambda ns: ns[0] == 2 and ns[-1] == 0)
    tt = qc_term_table(fd)
    mpo = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
    info = MPSInfo.casci(mpo.group, mpo.site_quanta,
                         (fd.n_elec, fd.twos, fd.ipg), 150,
                         n_inactive=ni, n_virtual=nv)
    e = _dmrg_energy(fd, info)
    assert abs(e - e_ed) < 1e-9, (e, e_ed)


def test_nevpt_mps_info():
    """NEVPTMPSInfo (reference mps.hpp:1494): <= 2 holes in core AND
    <= 2 electrons in external simultaneously."""
    fd = FCIDUMP.parse("/root/reference/tests/driver/FCIDUMP")
    g = None
    from block2_preview_tpu.driver.core import DMRGDriver
    drv = DMRGDriver()
    drv.read_fcidump("/root/reference/tests/driver/FCIDUMP")
    ni, nx = 1, 2
    info = MPSInfo.nevpt(drv.group,
                         [drv.spec.quanta(int(p)) for p in drv.orb_sym],
                         (fd.n_elec, fd.twos, fd.ipg), 120, ni, nx)
    e = _dmrg_energy(fd, info)
    L = fd.n_sites
    e_ed = _restricted_ed(
        fd, lambda occ: (2 * ni - sum(occ[:ni]) <= 2)
        and (sum(occ[L - nx:]) <= 2))
    assert abs(e - e_ed) < 1e-8, (e, e_ed)


def test_dynamic_bond_dims():
    fd = FCIDUMP.parse("/root/reference/data/HUBBARD-L6.FCIDUMP")
    from block2_preview_tpu.driver.core import DMRGDriver
    drv = DMRGDriver()
    drv.read_fcidump("/root/reference/data/HUBBARD-L6.FCIDUMP")
    info = MPSInfo(drv.group,
                   [drv.spec.quanta(int(p)) for p in drv.orb_sym],
                   (fd.n_elec, fd.twos, fd.ipg), 100)
    caps = [1, 4, 10, 10, 4, 1, 1]
    info.set_bond_dimension_dynamic(caps)
    for t in range(info.n_sites + 1):
        assert info.bonds[t].n_states_total <= max(
            caps[min(t, len(caps) - 1)],
            len(info.bonds[t]))
