"""Converters between the production engine's MPS/MPO and the explicit
algebra layer (reference pyblock2/algebra/io.py MPSTools/MPOTools).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..ops.csr import w_nonzero as _w_nonzero

from ..dmrg.mpo import MPO as EngineMPO
from ..dmrg.mps import MPS as EngineMPS
from .core import MPO, MPS, SubTensor, Tensor


def mps_to_algebra(mps: EngineMPS) -> MPS:
    """Engine MPS (blocks keyed (ql, qp, qr), left-cumulative bond quanta)
    -> labeled rank-3 tensors."""
    out = []
    for t in range(mps.n_sites):
        tn = Tensor()
        for (ql, qp, qr), b in sorted(mps.tensors[t].blocks.items()):
            tn.blocks.append(SubTensor((ql, qp, qr), np.asarray(b)))
        out.append(tn)
    return MPS(out)


def mps_from_algebra(amps: MPS, info) -> EngineMPS:
    """Labeled tensors -> engine MPS with the given MPSInfo (bond dims are
    taken from the tensors themselves)."""
    from ..core.blocks import MPSTensor
    tensors = []
    for t in range(amps.n_sites):
        blocks = {}
        for b in amps.tensors[t].blocks:
            blocks[tuple(b.q_labels)] = np.asarray(b.reduced)
        tensors.append(MPSTensor(info.group, blocks))
    return EngineMPS(info, tensors, center=0)


def mpo_to_algebra(mpo: EngineMPO) -> MPO:
    """Engine MPO (symbol-sparse: tensors[t][(i, o)] = phys matrix, bond
    charges bond_dqs) -> labeled rank-4 tensors (left charge, bra phys,
    ket phys, right charge); virtual dims = symbol multiplicity per
    charge."""
    L = mpo.n_sites
    out = []
    # per-bond: position of each symbol within its charge class
    pos: List[Dict[int, int]] = []
    cnt: List[Dict] = []
    for t in range(L + 1):
        p: Dict[int, int] = {}
        c: Dict = {}
        for s, dq in enumerate(mpo.bond_dqs[t]):
            p[s] = c.get(dq, 0)
            c[dq] = c.get(dq, 0) + 1
        pos.append(p)
        cnt.append(c)
    for t in range(L):
        quanta = mpo.site_quanta[t]
        # degenerate-quanta support: state position within its quantum
        ppos: Dict[int, int] = {}
        pcnt: Dict = {}
        for p, q in enumerate(quanta):
            ppos[p] = pcnt.get(q, 0)
            pcnt[q] = pcnt.get(q, 0) + 1
        acc: Dict = {}
        for (i, o), w in sorted(mpo.tensors[t].items()):
            dqi = mpo.bond_dqs[t][i]
            dqo = mpo.bond_dqs[t + 1][o]
            for pb, pk in zip(*_w_nonzero(w)):
                qb, qk = quanta[int(pb)], quanta[int(pk)]
                key = (dqi, qb, qk, dqo)
                big = acc.get(key)
                if big is None:
                    big = np.zeros((cnt[t][dqi], pcnt[qb], pcnt[qk],
                                    cnt[t + 1][dqo]), dtype=w.dtype)
                    acc[key] = big
                big[pos[t][i], ppos[int(pb)], ppos[int(pk)],
                    pos[t + 1][o]] += w[pb, pk]
        tn = Tensor()
        for key, big in sorted(acc.items()):
            tn.blocks.append(SubTensor(key, big))
        out.append(tn)
    return MPO(out, const_e=mpo.const_e)
