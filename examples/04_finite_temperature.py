"""Finite-temperature DMRG (ancilla purification): E(beta) for the Hubbard
chain vs the grand-canonical trace."""
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.ancilla import ft_energy

fd = FCIDUMP.parse("/root/reference/data/HUBBARD-L6.FCIDUMP")
for beta in (0.2, 1.0):
    e, _ = ft_energy(fd, beta, n_steps=10, bond_dim=200)
    print(f"beta = {beta:4.1f}:  E = {e:.8f}")
