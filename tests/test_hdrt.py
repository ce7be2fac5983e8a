"""Hamiltonian distinct-row table + path-factorized operator
(dmrg/hdrt.py; reference src/big_site/drt_big_site.hpp:421 HDRT,
src/big_site/drt_mps.hpp:563 HDRTMPO): path index <-> operator-string
bijection, coefficient-vector factorization roundtrip, and full
Hamiltonian fidelity through the path space."""

import numpy as np

from block2_preview_tpu.core.expr import (build_term_table, qc_raw_terms,
                                          qc_term_table)
from block2_preview_tpu.dmrg.hdrt import HDRT, HDRTMPO
from block2_preview_tpu.models.hubbard import hubbard_fcidump
from block2_preview_tpu.utils.ed import term_table_to_sparse

L = 4


def _raw():
    fd = hubbard_fcidump(L, u=2.0, t=1.0)
    return fd, qc_raw_terms(fd, cutoff=1e-13)


def _canon(ops):
    per = {}
    for s, e in ops:
        per.setdefault(s, []).append(e)
    return tuple((s, tuple(es)) for s, es in sorted(per.items()))


def test_index_term_bijection():
    _fd, raw = _raw()
    h = HDRT(L, raw)
    seen = {}
    for _c, ops in raw:
        ix = h.index(ops)
        back = _canon(h.term(ix))
        assert back == _canon(ops), (ops, h.term(ix))
        if back in seen:
            assert seen[back] == ix
        else:
            seen[back] = ix
    # distinct strings -> distinct indices
    assert len(set(seen.values())) == len(seen)
    assert max(seen.values()) < h.n_paths


def test_every_path_decodes():
    _fd, raw = _raw()
    h = HDRT(L, raw)
    for ix in range(h.n_paths):
        ops = h.term(ix)
        assert h.index(ops) == ix


def test_hdrtmpo_roundtrip():
    _fd, raw = _raw()
    h = HDRT(L, raw)
    v = h.coeff_vector()
    assert np.count_nonzero(v) > 0
    mpo = HDRTMPO(h, v)
    assert np.abs(mpo.to_coeff_vector() - v).max() == 0.0
    # a random path-space vector also roundtrips (factorization is of
    # the whole space, not just the Hamiltonian's support)
    rng = np.random.RandomState(0)
    w = rng.standard_normal(h.n_paths)
    assert np.abs(HDRTMPO(h, w).to_coeff_vector() - w).max() < 1e-14


def test_hamiltonian_fidelity_through_paths():
    """Decode every nonzero path of the coefficient vector back to raw
    terms and rebuild the Hamiltonian — dense parity with the original
    term table."""
    fd, raw = _raw()
    h = HDRT(L, raw)
    v = h.coeff_vector()
    raw2 = [(float(v[ix]), h.term(ix)) for ix in np.nonzero(v)[0]]
    ref = term_table_to_sparse(qc_term_table(fd)).toarray()
    got = term_table_to_sparse(build_term_table(L, raw2)).toarray()
    assert np.abs(got - ref).max() < 1e-12


def test_point_group_rows():
    """Orbital pg labels enter the row quanta (XOR factor)."""
    fd, raw = _raw()
    h0 = HDRT(L, raw)
    h1 = HDRT(L, raw, site_pgs=[0, 1, 0, 1])
    # pg refines the rows, pruning symmetry-forbidden crossings
    assert 0 < h1.n_paths <= h0.n_paths
    pgs = {q[2] for rows in h1.rows for (q, _r) in rows}
    assert 1 in pgs
    for _c, ops in raw[:50]:
        assert _canon(h1.term(h1.index(ops))) == _canon(ops)
