"""CSR sparse site operators (reference src/core/csr_sparse_matrix.hpp
CSRMatrixRef, csr_operator_functions.hpp; big sites hold operators CSR
in src/big_site/big_site.hpp): the host operator pipeline — registry,
delta-quantum inference, MPO assembly, blocking plans — runs on
scipy.sparse matrices without densifying, and big-site DMRG energies
are identical to the dense path."""

import numpy as np
import scipy.sparse as sp

from block2_preview_tpu.big_site import (fock_site_spec,
                                         regroup_raw_terms)
from block2_preview_tpu.core.expr import build_term_table, qc_raw_terms, \
    qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.core.symmetry import SZ_GROUP
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.ops.csr import (as_dense, csr_from_triplets,
                                        mat_any, mat_key, w_nonzero)
from block2_preview_tpu.ops.local_ops import SZ_SITE, OpRegistry, \
    op_delta_quantum


def test_csr_helpers():
    a = np.zeros((5, 7))
    a[1, 2] = 3.0
    a[4, 0] = -1.5
    c = csr_from_triplets([1, 4], [2, 0], [3.0, -1.5], (5, 7))
    assert np.allclose(as_dense(c), a)
    r, cc = w_nonzero(c)
    assert sorted(zip(r.tolist(), cc.tolist())) == [(1, 2), (4, 0)]
    assert mat_any(c) and not mat_any(sp.csr_matrix((5, 7)))
    # registry dedup across repeated registration
    reg = OpRegistry()
    i1 = reg.register(c)
    i2 = reg.register(c.copy())
    assert i1 == i2 and sp.issparse(reg[i1])
    assert mat_key(c) == mat_key(c.copy())


def test_csr_delta_quantum():
    q = SZ_SITE.quanta(0)
    cre_a = sp.csr_matrix(SZ_SITE.elem_mats[0])
    dq = op_delta_quantum(SZ_GROUP, cre_a, q)
    assert dq == (1, 1, 0)


def test_csr_big_site_spec():
    spec = fock_site_spec([0, 0, 0], sparse=True)
    assert sp.issparse(spec.ident) and sp.issparse(spec.parity)
    for m in spec.elem_mats.values():
        assert sp.issparse(m)
        assert m.count_nonzero() <= spec.dim
    # anticommutators still hold through sparse algebra
    c = spec.elem_mats[0]
    d = spec.elem_mats[1]
    assert abs(as_dense(c @ d + d @ c) - np.eye(spec.dim)).max() < 1e-12
    # composites (occupancy walks) are sparse too
    comp = spec.compose((0, 5), False)
    assert sp.issparse(comp) and comp.count_nonzero() <= spec.dim


def test_csr_big_site_dmrg_parity():
    """Forced-CSR big-site DMRG == dense big-site DMRG == restricted ED
    (the sweep engine consumes w entries through sparse-aware scans)."""
    from block2_preview_tpu.utils.ed import sector_indices, \
        term_table_to_sparse
    fd = FCIDUMP.hubbard(6, t=1.0, u=4.0)
    groups = [[0], [1], [2], [3, 4, 5]]
    raw = qc_raw_terms(fd)
    grouped = regroup_raw_terms(raw, groups)
    energies = {}
    for sparse in (False, True):
        specs = [SZ_SITE, SZ_SITE, SZ_SITE,
                 fock_site_spec([0, 0, 0], sparse=sparse)]
        tt = build_term_table(4, grouped, group=SZ_GROUP, spec=specs)
        mpo = build_mpo(tt, site_pgs=[0] * 4, const_e=fd.const_e,
                        spec=specs)
        sq = [specs[t].quanta(0) for t in range(4)]
        info = MPSInfo(SZ_GROUP, sq, (6, 0, 0), 120)
        mps = MPS.random(info, seed=11)
        energies[sparse] = DMRG(mpo, mps, iprint=0).solve(
            [120], [1e-4, 1e-5, 0], [1e-10], n_sweeps=10, tol=1e-10)
    h = term_table_to_sparse(qc_term_table(fd))
    ix = sector_indices(6, 6, 0)
    e_ed = float(np.linalg.eigvalsh(h[np.ix_(ix, ix)].toarray())[0])
    assert abs(energies[True] - energies[False]) < 1e-9
    assert abs(energies[True] - e_ed) < 1e-9
