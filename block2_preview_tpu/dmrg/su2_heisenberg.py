"""Back-compat shim: the SU(2) Heisenberg prototype grew into the generic
spin-adapted engine in su2_spin.py (arbitrary site spin, target spin, and
reduced MPO).  See that module for conventions and reference citations."""

from .su2_spin import (SU2HeisenbergDMRG, SU2SpinDMRG, coupled_factor,
                       heisenberg_entries, spin_reduced_element)

__all__ = ["SU2HeisenbergDMRG", "SU2SpinDMRG", "coupled_factor",
           "heisenberg_entries", "spin_reduced_element"]
