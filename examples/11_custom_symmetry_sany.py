"""Custom symmetry groups (SAny), including non-abelian SU(2) factors.

Mirrors the reference custom-hamiltonians tutorial
(docs/source/tutorial/custom-hamiltonians.ipynb): compose symmetry
sub-groups at runtime, define site bases + operator matrices, and build
Hamiltonians from expression strings.  With an SU(2) pair in the
composition the matrices are REDUCED multiplet-basis matrices and terms
use coupled expression strings like "((C+D)2+(C+D)2)0"."""
import numpy as np

from block2_preview_tpu.driver.core import DMRGDriver, SymmetryTypes

# --- 1. abelian composition: spinless t-V chain under U1Fermi ---------
L = 8
drv = DMRGDriver(SymmetryTypes.SZ)
drv.set_symmetry_groups("U1Fermi")
basis = [[((0,), 1), ((1,), 1)]] * L
c = np.zeros((2, 2))
c[1, 0] = 1.0
drv.get_custom_hamiltonian(basis, [{"c": c, "d": c.T.copy()}] * L)
b = drv.expr_builder()
for i in range(L - 1):
    b.add_term("cd", [i, i + 1], -1.0)
    b.add_term("cd", [i + 1, i], -1.0)
    b.add_term("cdcd", [i, i, i + 1, i + 1], 1.5)
mpo = drv.get_mpo(b.finalize())
from block2_preview_tpu.dmrg.sweep import DMRG
mps = drv.get_random_mps(100, target=(L // 2,))
e = DMRG(mpo, mps, iprint=0).solve([100], [1e-4, 0], [1e-10], n_sweeps=8)
print("spinless t-V chain     E = %.10f" % e)

# --- 2. SAnySU2: spin-adapted Hubbard chain from reduced matrices -----
L, U, NE = 8, 2.0, 8
drv = DMRGDriver(SymmetryTypes.SZ)
drv.set_symmetry_groups("U1Fermi", "SU2", "SU2")
SQ2 = 2 ** 0.5
ops = {
    "": np.eye(3),                                        # identity
    "C": np.array([[0, 0, 0], [1, 0, 0], [0, -SQ2, 0]]),  # a+ (rank 1/2)
    "D": np.array([[0, SQ2, 0], [0, 0, 1], [0, 0, 0]]),   # a  (rank 1/2)
}
site_basis = [[((0, 0, 0), 1), ((1, 1, 1), 1), ((2, 0, 0), 1)]] * L
drv.initialize_system(n_sites=L, vacuum=(0, 0, 0), target=(NE, 0, 0),
                      hamil_init=False)
drv.get_custom_hamiltonian(site_basis, [ops] * L)
b = drv.expr_builder()
b.add_term("(C+D)0",
           [x for i in range(L - 1) for x in [i, i + 1, i + 1, i]], -SQ2)
b.add_term("((C+(C+D)0)1+D)0",
           [x for i in range(L) for x in [i, i, i, i]], U)
mpo = drv.get_mpo(b.finalize(adjust_order=True))
ket = drv.get_random_mps(bond_dim=250)
e = drv.dmrg(mpo, ket, bond_dims=[250] * 4 + [400] * 4,
             noises=[1e-4] * 4 + [1e-5] * 3 + [0], thrds=[1e-10] * 8,
             n_sweeps=10, iprint=0)
print("SU(2) Hubbard          E = %.10f  (ref tutorial -6.225634144666)"
      % e)

# --- 3. SAnySU2 t-J model: spin-coupled two-site terms ----------------
LX = LY = 2
L, J, NE, TWOS = LX * LY, 0.4, 3, 1
drv = DMRGDriver(SymmetryTypes.SZ)
drv.set_symmetry_groups("U1Fermi", "SU2", "SU2")
C = np.array([[0, 0], [1, 0]])
D = np.array([[0, SQ2], [0, 0]])
site_basis = [[((0, 0, 0), 1), ((1, 1, 1), 1)]] * L
drv.initialize_system(n_sites=L, target=(NE, TWOS, TWOS),
                      hamil_init=False)
drv.get_custom_hamiltonian(site_basis, [{"": np.eye(2), "C": C,
                                         "D": D}] * L)
b = drv.expr_builder()
for (a, bb) in [(0, 1), (0, 2), (1, 3), (2, 3)]:
    b.add_term("(C+D)0", [a, bb, bb, a], -SQ2)
    b.add_term("((C+D)2+(C+D)2)0", [a, a, bb, bb], J * -(3 ** 0.5) / 2)
    b.add_term("((C+D)0+(C+D)0)0", [a, a, bb, bb], J * -1 / 2)
mpo = drv.get_mpo(b.finalize())
e = drv.dmrg(mpo, drv.get_random_mps(bond_dim=120), bond_dims=[120],
             noises=[1e-4, 1e-5, 0], thrds=[1e-11], n_sweeps=10,
             iprint=0)
print("t-J plaquette (S=1/2)  E = %.10f" % e)

# --- 4. pure-spin composition: S=1/2 Heisenberg chain -----------------
L = 10
drv = DMRGDriver(SymmetryTypes.SZ)
drv.set_symmetry_groups("SU2", "SU2")
T = np.array([[np.sqrt(3.0) / 2]])          # <1/2||S||1/2>
drv.initialize_system(n_sites=L, target=(0, 0), hamil_init=False)
drv.get_custom_hamiltonian([[((1, 1), 1)]] * L, [{"T": T}] * L,
                           su2_ranks={"T": 2})
b = drv.expr_builder()
for i in range(L - 1):
    b.add_term("(T+T)0", [i, i + 1], -np.sqrt(3.0))   # S_i . S_{i+1}
mpo = drv.get_mpo(b.finalize())
e = drv.dmrg(mpo, drv.get_random_mps(bond_dim=100), bond_dims=[100],
             noises=[1e-4, 0], thrds=[1e-11], n_sweeps=8, iprint=0)
print("Heisenberg S=1/2 L=10  E = %.10f" % e)
