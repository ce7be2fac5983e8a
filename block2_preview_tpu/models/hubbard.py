"""Hubbard model front-end (reference src/core/hubbard.hpp:31
HubbardFCIDUMP; k-space variant at hubbard.hpp:81 comes with the K-symmetry
mode in a later stage)."""

from ..core.fcidump import FCIDUMP


def hubbard_fcidump(n_sites: int, u: float = 2.0, t: float = 1.0,
                    n_elec=None, twos: int = 0) -> FCIDUMP:
    return FCIDUMP.hubbard(n_sites, u=u, t=t, n_elec=n_elec, twos=twos)


def hubbard_kspace(n_sites: int, u: float = 2.0, t: float = 1.0,
                   n_elec=None):
    """Momentum-space Hubbard chain with K-point symmetry (reference
    src/core/hubbard.hpp:81 HubbardKSpaceFCIDUMP; SZK quantum numbers,
    symmetry.hpp:738).  Returns (FCIDUMP, SymmetryGroup, site_quanta list,
    target) with total momentum as a mod-L factor."""
    import numpy as np

    from ..core.fcidump import FCIDUMP
    from ..core.symmetry import SymmetryGroup

    L = n_sites
    eps = -2.0 * t * np.cos(2.0 * np.pi * np.arange(L) / L)
    h1e = np.diag(eps)
    g2e = np.zeros((L,) * 4)
    for i in range(L):
        for j in range(L):
            for k in range(L):
                l = (i - j + k) % L
                # chemist (ij|kl): momentum conservation ki-kj+kk-kl = 0
                g2e[i, j, k, l] = u / L
    fd = FCIDUMP(n_sites=L, n_elec=n_elec or L, twos=0,
                 orb_sym=np.arange(L, dtype=np.int64), h1e=h1e, g2e=g2e)
    group = SymmetryGroup(("u1", "u1", f"mod{L}"), ("n", "twosz", "k"))
    site_quanta = [[(0, 0, 0), (1, 1, k), (1, -1, k), (2, 0, (2 * k) % L)]
                   for k in range(L)]
    target = (fd.n_elec, 0, 0)
    return fd, group, site_quanta, target
