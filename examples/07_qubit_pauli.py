"""Qubit-mode DMRG: transverse-field Ising from Pauli strings, and a
fermion Hamiltonian through the Jordan-Wigner transform."""
import numpy as np

from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.models.qubit import (jordan_wigner, pauli_mpo,
                                             qubit_random_mps)

n, j, h = 10, 1.0, 0.5
strings = []
for i in range(n - 1):
    s = ["I"] * n
    s[i] = s[i + 1] = "Z"
    strings.append((-j, "".join(s)))
for i in range(n):
    s = ["I"] * n
    s[i] = "X"
    strings.append((-h, "".join(s)))
mpo = pauli_mpo(n, strings)
e = DMRG(mpo, qubit_random_mps(n, 40), iprint=0).solve(
    [40], [1e-4, 0], [1e-10], n_sweeps=8, tol=1e-10)
print(f"TFIM n={n} J={j} h={h}: E = {e:.10f}")

# quadratic fermions -> qubits
rng = np.random.RandomState(0)
h1 = rng.standard_normal((4, 4))
h1 = (h1 + h1.T) / 2
jw = jordan_wigner(h1)
mpo = pauli_mpo(4, jw)
e = DMRG(mpo, qubit_random_mps(4, 20), iprint=0).solve(
    [20], [1e-4, 0], [1e-10], n_sweeps=8, tol=1e-10)
print(f"JW quadratic-fermion ground state: {e:.10f}")
