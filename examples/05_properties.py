"""Properties: PDMs, orbital entropies / mutual information, determinant
analysis, stochastic PT2 on top of a truncated MPS."""
import numpy as np

from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.driver.core import DMRGDriver
from block2_preview_tpu.sp_dmrg import StochasticPDMRG

driver = DMRGDriver()
fd = FCIDUMP.hubbard(6, t=1.0, u=4.0)
driver.initialize_system(fd.n_sites, fd.n_elec, fd.twos, orb_sym=fd.orb_sym)
mpo = driver.get_qc_mpo(fcidump=fd)
ket = driver.get_random_mps(bond_dim=40)
e0 = driver.dmrg(mpo, ket, bond_dims=[40], noises=[1e-4, 0], thrds=[1e-9],
                 n_sweeps=8, iprint=0)
print(f"E0(D=40) = {e0:.8f}")

dm1 = driver.get_npdm(ket, pdm_type=1)
print("site occupations:", np.round(np.diag(dm1.sum(axis=0)), 4))

s1 = driver.get_orbital_entropies(ket)
minfo = driver.get_orbital_interaction_matrix(ket)
print("1-orbital entropies:", np.round(s1, 4))
print("max mutual information:", round(float(minfo.max()), 4))

dets = driver.get_csf_coefficients(ket, cutoff=0.15)
print("dominant configurations:", dets[:3])

sp = StochasticPDMRG(ket, qc_term_table(fd), e0=e0)
est, err = sp.pt2_sample(300, seed=3)
print(f"stochastic EN-PT2 (psi-sampled): {est:.6f} +- {err:.6f}")
