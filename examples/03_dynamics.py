"""Real-time TDVP evolution and a correction-vector Green's function."""
import numpy as np

from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.driver.core import DMRGDriver

driver = DMRGDriver()
fd = FCIDUMP.hubbard(6, t=1.0, u=2.0)
driver.initialize_system(fd.n_sites, fd.n_elec, fd.twos, orb_sym=fd.orb_sym)
mpo = driver.get_qc_mpo(fcidump=fd)
ket = driver.get_random_mps(bond_dim=100)
e0 = driver.dmrg(mpo, ket, bond_dims=[100], noises=[1e-4, 0], thrds=[1e-9],
                 n_sweeps=8, iprint=0)
print(f"E0 = {e0:.8f}")

# retarded Green's function G_00(omega) by correction vector (before the
# evolution — td_dmrg turns the ket complex in place)
g = driver.greens_function(mpo, ket, e0, "d", 0, omega=-1.0, eta=0.1,
                           bond_dim=100)
print(f"G_00(-1.0 + 0.1i) = {g:.6f}")

# real-time evolution (TDVP)
e_t, te = driver.td_dmrg(mpo, ket, delta_t=0.05, n_steps=4, bond_dim=100)
print(f"TDVP real-time evolution: energy drift = {abs(e_t - e0):.2e}")
