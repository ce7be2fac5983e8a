"""Hubbard model front-end (reference src/core/hubbard.hpp:31
HubbardFCIDUMP; k-space variant at hubbard.hpp:81 comes with the K-symmetry
mode in a later stage)."""

from ..core.fcidump import FCIDUMP


def hubbard_fcidump(n_sites: int, u: float = 2.0, t: float = 1.0,
                    n_elec=None, twos: int = 0) -> FCIDUMP:
    return FCIDUMP.hubbard(n_sites, u=u, t=t, n_elec=n_elec, twos=twos)
