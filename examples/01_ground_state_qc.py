"""Ground-state DMRG for N2/STO-3G + 1PDM (the hello-world workflow)."""
import numpy as np

from block2_preview_tpu.driver.core import DMRGDriver

driver = DMRGDriver()
fd = driver.read_fcidump("/root/reference/data/N2.STO3G.FCIDUMP")
mpo = driver.get_qc_mpo(fcidump=fd)
ket = driver.get_random_mps(bond_dim=250)
e = driver.dmrg(mpo, ket, bond_dims=[100, 250], noises=[1e-4, 1e-5, 0],
                thrds=[1e-8], n_sweeps=8)
print(f"E(DMRG)  = {e:.10f}  (block2 reference: -107.654122447525)")
dm1 = driver.get_npdm(ket, pdm_type=1)
print(f"tr(1pdm) = {np.trace(dm1.sum(axis=0)):.6f}  (n_elec = {fd.n_elec})")
