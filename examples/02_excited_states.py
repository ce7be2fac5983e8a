"""Excited states: state-averaged multi-root DMRG and S^2-penalty spin
targeting on the Hubbard chain."""
import numpy as np

from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.driver.core import DMRGDriver
from block2_preview_tpu.dmrg.sweep import DMRG

driver = DMRGDriver()
fd = FCIDUMP.hubbard(8, t=1.0, u=2.0)
driver.initialize_system(fd.n_sites, fd.n_elec, fd.twos, orb_sym=fd.orb_sym)
mpo = driver.get_qc_mpo(fcidump=fd)

# two lowest states in the (N, Sz) sector, state-averaged
ket = driver.get_random_mps(bond_dim=120)
d = DMRG(mpo, ket, n_roots=2, iprint=0)
d.solve([120], [1e-4, 1e-5, 0], [1e-9], n_sweeps=10, tol=1e-9)
print("state-averaged energies:", np.round(d.energies[-1], 8))

# lowest triplet via H + penalty (S^2 - S(S+1))
mpo_t = driver.get_qc_mpo_spin_penalty(fd, penalty=5.0, twos=2)
ket_t = driver.get_random_mps(bond_dim=120)
e_t = driver.dmrg(mpo_t, ket_t, bond_dims=[120], noises=[1e-4, 1e-5, 0],
                  thrds=[1e-9], n_sweeps=10)
print(f"lowest triplet: {e_t:.8f}")
