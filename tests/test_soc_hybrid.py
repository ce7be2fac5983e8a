"""SOCDMRGDriver.hybrid_mpo_dmrg: DMRG against the sum of a real
scalar-relativistic MPO and a complex SOC MPO in SGF mode (reference
SOCDMRGDriver.hybrid_mpo_dmrg, pyblock2/driver/core.py:8130), anchored
against exact diagonalization of H_scalar + H_SO."""

import numpy as np

from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.driver.core import SOCDMRGDriver, SymmetryTypes

NSO = 6   # spin orbitals


def _scalar_fd(rng):
    h1e = rng.standard_normal((NSO, NSO))
    h1e = 0.5 * (h1e + h1e.T)
    g2e = np.zeros((NSO,) * 4)
    return FCIDUMP(n_sites=NSO, n_elec=2, twos=0, ipg=0,
                   h1e=h1e, g2e=g2e, const_e=0.3,
                   orb_sym=[0] * NSO, general=True)


def _soc_fd(rng):
    m = rng.standard_normal((NSO, NSO)) + 1j * rng.standard_normal(
        (NSO, NSO))
    h1e = 0.05 * (m + m.conj().T) / 2
    g2e = np.zeros((NSO,) * 4, dtype=np.complex128)
    return FCIDUMP(n_sites=NSO, n_elec=2, twos=0, ipg=0,
                   h1e=h1e, g2e=g2e, const_e=0.0,
                   orb_sym=[0] * NSO, general=True)


def _ed(h1e_tot, const_e, n_elec):
    from itertools import combinations
    dets = list(combinations(range(NSO), n_elec))
    n = len(dets)
    h = np.zeros((n, n), dtype=np.complex128)
    for a, da in enumerate(dets):
        for b, db in enumerate(dets):
            diff = sorted(set(da) ^ set(db))
            if not diff:
                h[a, b] = sum(h1e_tot[p, p] for p in da)
            elif len(diff) == 2:
                p, q = diff
                if (p in da) == (p in db):
                    continue
                pb, pk = (p, q) if p in da else (q, p)
                sign = (-1) ** (sorted(da).index(pb)
                                + sorted(db).index(pk))
                h[a, b] = sign * h1e_tot[pb, pk]
    w = np.linalg.eigvalsh(h)
    return float(w[0]) + const_e


def test_hybrid_mpo_dmrg_vs_ed():
    rng = np.random.RandomState(11)
    fd_r, fd_c = _scalar_fd(rng), _soc_fd(rng)
    ref = _ed(fd_r.h1e + fd_c.h1e, fd_r.const_e, fd_r.n_elec)

    drv = SOCDMRGDriver(SymmetryTypes.SGF)
    drv.initialize_system(n_sites=NSO, n_elec=2, spin=0)
    mpo_r = drv.get_qc_mpo(fcidump=fd_r)
    mpo_c = drv.get_qc_mpo(fcidump=fd_c)
    mps = drv.get_random_mps(120)
    e = drv.hybrid_mpo_dmrg(mpo_r, mpo_c, mps,
                            bond_dims=[80, 120], noises=[1e-4, 1e-5, 0],
                            thrds=[1e-10], n_sweeps=8, tol=1e-11)
    e = complex(e)
    assert abs(e.imag) < 1e-8
    assert abs(e.real - ref) < 1e-8, (e, ref)
