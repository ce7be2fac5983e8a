"""Finite-temperature spectroscopy and spin-orbit coupling.

Time-domain finite-T Green's function (reference pyblock2/ft_tddmrg.py),
finite-T Chebyshev/KPM spectral function (ft_chebydmrg.py), and the
two SOC routes of SOCDMRGDriver (driver/core.py:8122): one-step
real+complex hybrid DMRG and the two-step Wigner-Eckart state
interaction from reduced triplet transition densities.
"""

import numpy as np

from block2_preview_tpu.dmrg.ancilla import (ft_chebyshev_spectral,
                                             ft_fourier_gf,
                                             ft_td_greens_function)
from block2_preview_tpu.driver.core import SOCDMRGDriver, SymmetryTypes
from block2_preview_tpu.models.hubbard import hubbard_fcidump

fd = hubbard_fcidump(2, u=2.0, t=1.0)

# --- time-domain finite-T GF: evolve a_0|rho(beta)> in real time ---
ts, gf_t, e_beta = ft_td_greens_function(
    fd, beta=1.0, dt=0.1, n_t=20, isite=0, jsite=0,
    n_time_steps=16, bond_dim=100, gf_bond_dim=100)
omegas = np.linspace(-2.0, 2.0, 9)
gw = ft_fourier_gf(ts, gf_t, omegas, eta=0.3)
print("E(beta=1) =", round(e_beta, 8))
print("A(w) from time domain:", (-gw.imag / np.pi).round(4))

# --- finite-T Chebyshev (KPM) spectral function, same observable ---
aw, mus, _ = ft_chebyshev_spectral(
    fd, beta=1.0, omegas=omegas, n_moments=12, isite=0, jsite=0,
    a=4.0, b=0.0, n_time_steps=16, bond_dim=100, cheb_bond_dim=100)
print("A(w) from KPM:        ", aw.round(4))

# --- SOC: hybrid real+complex MPO DMRG (SGF mode) ---
from block2_preview_tpu.core.fcidump import FCIDUMP
rng = np.random.RandomState(0)
NSO = 6
h1 = rng.standard_normal((NSO, NSO))
h1 = 0.5 * (h1 + h1.T)
m = rng.standard_normal((NSO, NSO)) + 1j * rng.standard_normal((NSO, NSO))
fd_r = FCIDUMP(n_sites=NSO, n_elec=2, twos=0, h1e=h1,
               g2e=np.zeros((NSO,) * 4), orb_sym=[0] * NSO, general=True)
fd_c = FCIDUMP(n_sites=NSO, n_elec=2, twos=0, h1e=0.05 * (m + m.conj().T),
               g2e=np.zeros((NSO,) * 4, dtype=complex),
               orb_sym=[0] * NSO, general=True)
drv = SOCDMRGDriver(SymmetryTypes.SGF)
drv.initialize_system(n_sites=NSO, n_elec=2, spin=0)
e = drv.hybrid_mpo_dmrg(drv.get_qc_mpo(fcidump=fd_r),
                        drv.get_qc_mpo(fcidump=fd_c),
                        drv.get_random_mps(100),
                        bond_dims=[100], noises=[1e-4, 0], thrds=[1e-10],
                        n_sweeps=8, tol=1e-10, iprint=0)
print("hybrid SOC ground state:", complex(e).real)

# --- SOC: two-step state interaction from reduced densities ---
# (energies/2S per scalar root + one reduced triplet transition density
# per root pair; all magnetic components reconstructed by Wigner-Eckart)
w, h_si = SOCDMRGDriver.soc_two_step(
    energies=[-1.0, -0.6], twoss=[0, 2],
    pdms_dict={(0, 1): rng.standard_normal((3, 3)),
               (1, 1): rng.standard_normal((3, 3))},
    hsomo=0.01j * np.ones((3, 3, 3)))
print("SI-SOC levels:", w.round(6))
