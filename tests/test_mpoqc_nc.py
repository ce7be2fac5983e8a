"""Analytic NC/CN/Conventional MPOQC (dmrg/mpoqc_nc.py).

Mirrors reference MPOQC (qc_mpo.hpp:646 SZ, QCTypes NC/CN/Conventional with
the NC->CN schemer switch).  Anchors: dense contraction of the analytic MPO
equals the term-table Hamiltonian exactly (all three schemes); DMRG on the
Conventional MPO reproduces block2's N2/STO-3G reference energy.
"""

import numpy as np
import pytest

from block2_preview_tpu.core.expr import build_term_table, qc_raw_terms
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.mpoqc_nc import build_mpoqc
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.models.hubbard import hubbard_fcidump
from block2_preview_tpu.utils.ed import term_table_to_sparse


@pytest.mark.parametrize("scheme", ["nc", "cn", "conventional"])
def test_dense_parity_h4(scheme):
    fd = FCIDUMP.parse("/root/reference/data/H4.STO6G.R1.8.FCIDUMP")
    h_ref = term_table_to_sparse(
        build_term_table(fd.n_sites, qc_raw_terms(fd))).toarray()
    mpo = build_mpoqc(fd, scheme=scheme)
    assert np.abs(mpo.to_dense() - h_ref).max() < 1e-12


@pytest.mark.parametrize("scheme", ["nc", "conventional"])
def test_dense_parity_hubbard6(scheme):
    fd = hubbard_fcidump(6, u=4.0)
    h_ref = term_table_to_sparse(
        build_term_table(fd.n_sites, qc_raw_terms(fd))).toarray()
    mpo = build_mpoqc(fd, scheme=scheme)
    assert np.abs(mpo.to_dense() - h_ref).max() < 1e-12


def test_conventional_smaller_than_nc_at_end():
    fd = FCIDUMP.parse("/root/reference/data/N2.STO3G.FCIDUMP")
    bd_nc = build_mpoqc(fd, scheme="nc").bond_dims
    bd_cv = build_mpoqc(fd, scheme="conventional").bond_dims
    # NC keeps growing right of the middle; Conventional switches to CN
    assert bd_cv[-2] < bd_nc[-2]


@pytest.mark.slow
def test_n2_dmrg_reference_energy():
    fd = FCIDUMP.parse("/root/reference/data/N2.STO3G.FCIDUMP")
    mpo = build_mpoqc(fd, scheme="conventional")
    info = MPSInfo(mpo.group, mpo.site_quanta,
                   (fd.n_elec, fd.twos, fd.ipg), 500)
    mps = MPS.random(info)
    dmrg = DMRG(mpo, mps, iprint=0)
    e = dmrg.solve([250, 500], [1e-4, 1e-5, 0], [1e-10], n_sweeps=10,
                   tol=1e-9)
    assert abs(e - (-107.654122447525)) < 1e-7
