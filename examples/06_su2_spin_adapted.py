"""Spin-adapted (SU(2)) DMRG: Heisenberg chain and the fermionic Hubbard
chain in total-spin sectors."""
from block2_preview_tpu.dmrg.su2_fermion import hubbard_su2_dmrg
from block2_preview_tpu.dmrg.su2_spin import SU2HeisenbergDMRG

# spin-1/2 Heisenberg, singlet ground state
d = SU2HeisenbergDMRG(16, bond_dim=64)
print(f"Heisenberg L=16 singlet: {d.solve(n_sweeps=6):.10f} "
      "(exact -6.9117371456)")

# spin-1 (Haldane) chain
d = SU2HeisenbergDMRG(8, bond_dim=48, tj_site=2)
print(f"Haldane    L=8  singlet: {d.solve(n_sweeps=6):.10f}")

# Hubbard chain at half filling, singlet and triplet sectors
for twos in (0, 2):
    d = hubbard_su2_dmrg(8, 1.0, 4.0, twos=twos, bond_dim=120)
    print(f"Hubbard L=8 U=4 2S={twos}: {d.solve(n_sweeps=8):.10f}")
