"""MPO-builder tests: contract the bipartite-compressed MPO back to a dense
many-body matrix and compare against the ED harness built from the same term
table (mirrors reference unit_test/test_mpo-style coverage)."""

import numpy as np
import pytest

from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.utils.ed import term_table_to_sparse


@pytest.mark.parametrize("name", ["hubbard4", "driver6", "h4"])
def test_mpo_dense_parity(name):
    if name == "hubbard4":
        fd = FCIDUMP.hubbard(4, u=2.0, t=1.0)
    elif name == "driver6":
        fd = FCIDUMP.parse("/root/reference/tests/driver/FCIDUMP")
    else:
        fd = FCIDUMP.parse("/root/reference/data/H4.STO6G.R1.8.FCIDUMP")
    tt = qc_term_table(fd)
    mpo = build_mpo(tt, site_pgs=fd.orb_sym)
    dense_mpo = mpo.to_dense()
    dense_ed = term_table_to_sparse(tt).toarray()
    assert np.max(np.abs(dense_mpo - dense_ed)) < 1e-12


def test_mpo_bond_dims_reasonable():
    fd = FCIDUMP.parse("/root/reference/data/N2.STO3G.FCIDUMP")
    tt = qc_term_table(fd)
    mpo = build_mpo(tt, site_pgs=fd.orb_sym)
    dims = mpo.bond_dims
    assert dims[0] == 1 and dims[-1] == 1
    # O(K^2) scaling: K=10 spatial orbitals -> middle bond well under 4*K^2
    assert max(dims) < 4 * fd.n_sites ** 2
    # charge consistency of every entry
    g = mpo.group
    for t, w in enumerate(mpo.tensors):
        for (i, o), mat in w.items():
            from block2_preview_tpu.ops.local_ops import op_delta_quantum
            dq = op_delta_quantum(g, mat, mpo.site_quanta[t])
            expect = g.sub(mpo.bond_dqs[t + 1][o], mpo.bond_dqs[t][i])
            assert dq == expect or not np.any(mat)
