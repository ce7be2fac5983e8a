"""Finite-temperature DMRG via ancilla purification.

TPU-native counterpart of block2's AncillaMPO / AncillaMPSInfo machinery
(reference src/dmrg/mpo.hpp AncillaMPO; src/dmrg/mps.hpp:1594 AncillaMPSInfo,
set_thermal_limit at :1622, fill_thermal_limit at :1806) and the
pyblock2/ftdmrg.py application driver.

The chain is doubled: site 2t is physical orbital t, site 2t+1 its ancilla
(same local basis).  The infinite-temperature state pairs each physical state
|p> with the complementary ancilla state |pbar> (q_p + q_pbar = (2,0,0)), so
every pair carries charge (2,0,0) and the doubled-chain target is
(2 L_phys, 0, 0) — the purified ensemble is the full-Fock (grand canonical,
mu=0) trace.  Imaginary-time TDVP by beta/2 then yields thermal expectation
values.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..core.expr import RawTerm, TermTable, build_term_table
from ..core.fcidump import FCIDUMP
from ..core.symmetry import SZ_GROUP
from ..ops.local_ops import SZ_SITE
from .mpo import MPO
from .mpo_builder import build_mpo
from .mps import MPS, MPSInfo, MPSTensor
from .tdvp import TimeEvolution


def ancilla_raw_terms(raw: List[RawTerm]) -> List[RawTerm]:
    """Map operator sites t -> 2t (physical sites of the doubled chain)."""
    return [(c, [(2 * s, e) for (s, e) in ops]) for (c, ops) in raw]


def ancilla_qc_mpo(fd: FCIDUMP, cutoff: float = 1e-13) -> MPO:
    from ..core.expr import qc_raw_terms
    raw = ancilla_raw_terms(qc_raw_terms(fd, cutoff))
    L2 = 2 * fd.n_sites
    tt = build_term_table(L2, raw, group=SZ_GROUP)
    pgs = np.repeat(np.asarray(fd.orb_sym, dtype=np.int64), 2)
    return build_mpo(tt, site_pgs=pgs, const_e=fd.const_e)


def thermal_mps(fd: FCIDUMP) -> MPS:
    """Infinite-temperature purified MPS (reference fill_thermal_limit)."""
    g = SZ_GROUP
    L = fd.n_sites
    pgs = np.repeat(np.asarray(fd.orb_sym, dtype=np.int64), 2)
    site_quanta = [SZ_SITE.quanta(int(p)) for p in pgs]
    target = (2 * L, 0, 0)
    info = MPSInfo(g, site_quanta, target, bond_dim=4)
    tensors = []
    pair_q = (2, 0, 0)
    for t in range(2 * L):
        blocks = {}
        if t % 2 == 0:
            ql = (t, 0, 0)
            for qp in site_quanta[t]:
                qr = g.add(ql, qp)
                blocks[(ql, qp, qr)] = np.full((1, 1, 1), 0.5)
        else:
            for qp in site_quanta[t]:
                qr = (t + 1, 0, 0)
                ql = g.sub(qr, qp)
                blocks[(ql, qp, qr)] = np.full((1, 1, 1), 1.0)
        tensors.append(MPSTensor(g, blocks))
    return MPS(info, tensors, center=0)


def ft_energy(fd: FCIDUMP, beta: float, n_steps: int, bond_dim: int,
              iprint: int = 0) -> Tuple[float, TimeEvolution]:
    """E(beta) = Tr(H exp(-beta H)) / Tr(exp(-beta H)) over the full Fock
    space (reference pyblock2/ftdmrg.py workflow: thermal init + imaginary
    time evolution by beta/2)."""
    mpo = ancilla_qc_mpo(fd)
    mps = thermal_mps(fd)
    te = TimeEvolution(mpo, mps, imaginary=True, normalize=True,
                       iprint=iprint)
    # evolving the purification by beta/2 gives the thermal state at beta
    dt = (beta / 2.0) / n_steps
    e = te.solve(n_steps, dt, bond_dim)
    return e, te
