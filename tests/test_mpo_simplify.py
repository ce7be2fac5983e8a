"""Numeric MPO simplification (dmrg/mpo_simplify.py; reference
mpo_simplification.hpp:41 SimplifiedMPO<RuleQC>): dead-symbol
elimination + proportional-symbol CSE on the analytic NC/CN MPO,
exactness checked by dense contraction."""

import numpy as np
import pytest

from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.mpo_simplify import simplify_mpo
from block2_preview_tpu.dmrg.mpoqc_nc import build_mpoqc


def _dense_h(fd):
    from block2_preview_tpu.core.expr import qc_term_table
    from block2_preview_tpu.utils.ed import term_table_to_sparse
    return term_table_to_sparse(qc_term_table(fd)).toarray()


@pytest.mark.parametrize("scheme", ["nc", "cn", "conventional"])
def test_simplify_exactness_h4(scheme):
    fd = FCIDUMP.parse("/root/reference/data/H4.STO6G.R1.8.FCIDUMP")
    mpo = build_mpoqc(fd, scheme=scheme)
    dense0 = mpo.to_dense()
    rep = simplify_mpo(mpo)
    dense1 = mpo.to_dense()
    assert np.abs(dense0 - dense1).max() < 1e-10
    # the pass must actually compress the uncompressed analytic MPO
    assert sum(rep["bond_dims_after"]) < sum(rep["bond_dims_before"]), rep


def test_simplify_hubbard():
    fd = FCIDUMP.parse("/root/reference/data/HUBBARD-L6.FCIDUMP")
    mpo = build_mpoqc(fd, scheme="nc")
    dense0 = mpo.to_dense()
    rep = simplify_mpo(mpo)
    assert np.abs(dense0 - mpo.to_dense()).max() < 1e-10
    assert sum(rep["bond_dims_after"]) <= sum(rep["bond_dims_before"])
