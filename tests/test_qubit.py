"""Qubit/Pauli-string MPOs + Jordan-Wigner fermion transform
(reference get_mpo_from_pauli_strings, FermionTransform)."""

import numpy as np

from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.models.qubit import (jordan_wigner, pauli_mpo,
                                             pauli_strings_dense,
                                             qubit_random_mps)


def _tfim_strings(n, j=1.0, h=0.7):
    out = []
    for i in range(n - 1):
        s = ["I"] * n
        s[i] = s[i + 1] = "Z"
        out.append((-j, "".join(s)))
    for i in range(n):
        s = ["I"] * n
        s[i] = "X"
        out.append((-h, "".join(s)))
    return out


def test_pauli_mpo_dense_parity():
    strings = _tfim_strings(5) + [(0.3, "XYIYZ"), (-0.2, "IYXZI")]
    mpo = pauli_mpo(5, strings)
    want = pauli_strings_dense(5, strings)
    assert np.abs(mpo.to_dense() - want).max() < 1e-12


def test_tfim_dmrg():
    n = 8
    strings = _tfim_strings(n)
    mpo = pauli_mpo(n, strings)
    e_ed = float(np.linalg.eigvalsh(pauli_strings_dense(n, strings).real)[0])
    mps = qubit_random_mps(n, 40)
    e = DMRG(mpo, mps, iprint=0).solve([40], [1e-4, 0], [1e-10],
                                       n_sweeps=8, tol=1e-10)
    assert abs(e - e_ed) < 1e-8, (e, e_ed)


def test_pauli_dmrg_with_y_terms():
    """Complex MPO path: XY-model-like Hamiltonian with explicit Y strings."""
    n = 6
    strings = []
    for i in range(n - 1):
        for p in ("X", "Y"):
            s = ["I"] * n
            s[i] = s[i + 1] = p
            strings.append((-0.5, "".join(s)))
        s = ["I"] * n
        s[i] = "Z"
        strings.append((0.3, "".join(s)))
    mpo = pauli_mpo(n, strings)
    h = pauli_strings_dense(n, strings)
    assert np.abs(h - h.conj().T).max() < 1e-12
    e_ed = float(np.linalg.eigvalsh(h)[0])
    mps = qubit_random_mps(n, 40)
    e = DMRG(mpo, mps, iprint=0).solve([40], [1e-4, 0], [1e-10],
                                       n_sweeps=8, tol=1e-10)
    assert abs(e - e_ed) < 1e-8, (e, e_ed)


def test_jordan_wigner_quadratic():
    rng = np.random.RandomState(1)
    n = 4
    h1 = rng.standard_normal((n, n))
    h1 = (h1 + h1.T) / 2
    strings = jordan_wigner(h1)
    hq = pauli_strings_dense(n, strings)
    # dense fermion matrix with JW convention c_p = (prod_{q<p} Z) (X+iY)/2
    dim = 2 ** n
    hf = np.zeros((dim, dim), dtype=complex)
    X, Y = pauli_strings_dense(1, [(1.0, "X")]), \
        pauli_strings_dense(1, [(1.0, "Y")])
    Z = pauli_strings_dense(1, [(1.0, "Z")])
    I2 = np.eye(2)

    def ann(p):
        mats = [Z] * p + [(X + 1j * Y) / 2] + [I2] * (n - p - 1)
        out = np.eye(1)
        for m in mats:
            out = np.kron(out, m)
        return out
    for p in range(n):
        for q in range(n):
            hf += h1[p, q] * (ann(p).conj().T @ ann(q))
    assert np.abs(hq - hf).max() < 1e-10


def test_jordan_wigner_interacting_dmrg():
    """JW of a small interacting fermion problem, solved as a qubit DMRG,
    vs dense fermionic ED."""
    rng = np.random.RandomState(3)
    n = 4
    h1 = rng.standard_normal((n, n))
    h1 = (h1 + h1.T) / 2
    g2 = rng.standard_normal((n, n, n, n)) * 0.2
    # hermiticity + the p<->q, r<->s symmetry of c+_p c+_q c_s c_r pairing
    g2 = g2 + g2.transpose(1, 0, 3, 2)
    g2 = g2 + g2.transpose(2, 3, 0, 1)
    strings = jordan_wigner(h1, g2)
    mpo = pauli_mpo(n, strings)
    h = pauli_strings_dense(n, strings)
    e_ed = float(np.linalg.eigvalsh(h)[0])
    mps = qubit_random_mps(n, 30)
    e = DMRG(mpo, mps, iprint=0).solve([30], [1e-4, 0], [1e-10],
                                       n_sweeps=8, tol=1e-10)
    assert abs(e - e_ed) < 1e-8, (e, e_ed)


def test_driver_fermion_transform_surface():
    """Driver-level FermionTransform (reference core.py:9198)."""
    import numpy as np
    from block2_preview_tpu.driver.core import FermionTransform
    h1 = np.array([[0.5, 0.2], [0.2, -0.3]])
    strings = FermionTransform.jordan_wigner(h1)
    from block2_preview_tpu.models.qubit import pauli_strings_dense
    dense = pauli_strings_dense(2, strings)
    # n_p = (1 - Z_p)/2; hopping via X/Y -> spectrum must match the
    # 2-spin-orbital one-body Hamiltonian over the full Fock space
    from block2_preview_tpu.core.expr import build_term_table
    from block2_preview_tpu.ops.local_ops import SGF_SITE, CRE_A, DES_A
    from block2_preview_tpu.utils.ed import term_table_to_sparse
    raw = [(h1[p, q], [(p, CRE_A), (q, DES_A)]) for p in range(2)
           for q in range(2) if h1[p, q] != 0]
    from block2_preview_tpu.core.symmetry import SymmetryGroup
    g = SymmetryGroup(("u1",), ("n",))
    tt = build_term_table(2, raw, group=g, spec=SGF_SITE)
    ref = term_table_to_sparse(tt).toarray()
    wr = np.sort(np.linalg.eigvalsh(ref))
    wd = np.sort(np.linalg.eigvalsh(dense))
    assert np.abs(wr - wd).max() < 1e-12
