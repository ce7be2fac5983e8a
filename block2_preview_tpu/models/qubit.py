"""Qubit (Pauli-string) Hamiltonians.

Counterpart of the reference's qubit workflows (pyblock2/driver/core.py:4205
get_mpo_from_pauli_strings; FermionTransform Jordan-Wigner at :9198): spin-1/2
sites with a trivial symmetry sector, Hamiltonians given as weighted Pauli
strings, compiled through the same term-table -> bipartite-MPO pipeline as
the fermionic models.  Y terms make the MPO complex; the sweep engine's
complex path (used for relativistic DHF) handles them unchanged.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from ..core.expr import TermTable, build_term_table
from ..core.symmetry import SymmetryGroup
from ..dmrg.mpo import MPO
from ..dmrg.mpo_builder import build_mpo
from ..dmrg.mps import MPS, MPSInfo
from ..ops.local_ops import SiteBasisSpec

# trivial symmetry: one xor factor, every state in sector (0,)
QUBIT_GROUP = SymmetryGroup(("xor",), ("triv",), fermion_index=0)

PAULI_X, PAULI_Y, PAULI_Z = 0, 1, 2
# X and Z stay real so purely real Hamiltonians keep the real sweep path;
# only Y forces the complex dtype
_PAULIS = {
    PAULI_X: np.array([[0.0, 1.0], [1.0, 0.0]]),
    PAULI_Y: np.array([[0.0, -1.0j], [1.0j, 0.0]]),
    PAULI_Z: np.array([[1.0, 0.0], [0.0, -1.0]]),
}
_I2 = np.eye(2)

QUBIT_SITE = SiteBasisSpec(
    "qubit", 2, dict(_PAULIS), _I2.copy(), _I2.copy(),
    lambda pg: [(0,), (0,)], fermionic=False)

_LETTER = {"X": PAULI_X, "Y": PAULI_Y, "Z": PAULI_Z}


def pauli_term_table(n_qubits: int,
                     strings: Sequence[Tuple[float, str]]) -> TermTable:
    """strings: [(coeff, 'XXIZ...'), ...] with one letter per qubit
    ('I' for identity)."""
    raw = []
    for coeff, s in strings:
        assert len(s) == n_qubits, (s, n_qubits)
        ops = [(i, _LETTER[ch]) for i, ch in enumerate(s.upper())
               if ch != "I"]
        raw.append((coeff, ops))
    return build_term_table(n_qubits, raw, group=QUBIT_GROUP,
                            spec=QUBIT_SITE)


def pauli_mpo(n_qubits: int, strings: Sequence[Tuple[float, str]],
              const_e: float = 0.0) -> MPO:
    tt = pauli_term_table(n_qubits, strings)
    return build_mpo(tt, spec=QUBIT_SITE, const_e=const_e)


def qubit_random_mps(n_qubits: int, bond_dim: int = 50,
                     seed: int = 1234) -> MPS:
    sq = [QUBIT_SITE.quanta(0) for _ in range(n_qubits)]
    info = MPSInfo(QUBIT_GROUP, sq, (0,), bond_dim)
    return MPS.random(info, seed=seed)


def pauli_strings_dense(n_qubits: int,
                        strings: Sequence[Tuple[float, str]]) -> np.ndarray:
    """Dense 2^n x 2^n matrix (tests / small systems)."""
    dim = 2 ** n_qubits
    h = np.zeros((dim, dim), dtype=complex)
    for coeff, s in strings:
        m = np.eye(1, dtype=complex)
        for ch in s.upper():
            m = np.kron(m, _I2 if ch == "I" else _PAULIS[_LETTER[ch]])
        h += coeff * m
    return h


def jordan_wigner(h1e: np.ndarray, g2e: np.ndarray = None,
                  cutoff: float = 1e-12) -> List[Tuple[float, str]]:
    """Jordan-Wigner transform of a (spin-orbital) fermion Hamiltonian to
    Pauli strings (reference FermionTransform, pyblock2/driver/core.py:9198).

    c_p = (prod_{q<p} Z_q) (X_p + i Y_p)/2;  supports the one-electron part
    plus an optional two-electron tensor in physicists' ordering
    sum_{pqrs} g[p,q,r,s]/2 c+_p c+_q c_s c_r (both hermitian).
    """
    n = h1e.shape[0]

    def _single(p, dag):
        # returns [(coeff, pauli_list)] for c_p^(+): pauli_list = [(q,'Z'),..]
        sgn = -1.0j if dag else 1.0j
        z = [(q, "Z") for q in range(p)]
        return [(0.5, z + [(p, "X")]), (sgn * 0.5, z + [(p, "Y")])]

    def _mul(a, b):
        out = []
        for ca, la in a:
            for cb, lb in b:
                out.append((ca * cb, la + lb))
        return out

    def _collect(terms, coeff, acc):
        table = {"II": (1, "I"), "XX": (1, "I"), "YY": (1, "I"),
                 "ZZ": (1, "I"),
                 "XY": (1j, "Z"), "YX": (-1j, "Z"),
                 "YZ": (1j, "X"), "ZY": (-1j, "X"),
                 "ZX": (1j, "Y"), "XZ": (-1j, "Y"),
                 "IX": (1, "X"), "XI": (1, "X"), "IY": (1, "Y"),
                 "YI": (1, "Y"), "IZ": (1, "Z"), "ZI": (1, "Z")}
        for c, ops in terms:
            letters = ["I"] * n
            cc = c * coeff
            for (q, p) in ops:
                f, r = table[letters[q] + p]
                cc *= f
                letters[q] = r
            key = "".join(letters)
            acc[key] = acc.get(key, 0.0) + cc
    acc = {}
    for p in range(n):
        for q in range(n):
            if abs(h1e[p, q]) > cutoff:
                _collect(_mul(_single(p, True), _single(q, False)),
                         h1e[p, q], acc)
    if g2e is not None:
        for p in range(n):
            for q in range(n):
                for r in range(n):
                    for s in range(n):
                        v = g2e[p, q, r, s]
                        if abs(v) < cutoff:
                            continue
                        t = _mul(_mul(_single(p, True), _single(q, True)),
                                 _mul(_single(s, False), _single(r, False)))
                        _collect(t, 0.5 * v, acc)
    out = []
    for key, c in acc.items():
        if abs(c) > cutoff:
            assert abs(c.imag) < 1e-9, (key, c)
            out.append((float(c.real), key))
    return out
