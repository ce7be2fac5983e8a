"""Two-orbital entropies / mutual information vs dense JW-dressed units
(reference pyblock2 get_orbital_entropies / get_orbital_interaction_matrix,
Rissler-Legeza two-orbital RDM with fermionic phases)."""

from itertools import product

import numpy as np

from block2_preview_tpu.core.symmetry import SZ_GROUP
from block2_preview_tpu.dmrg.determinant import det_coefficient
from block2_preview_tpu.dmrg.expect import (orbital_entropy_1site,
                                            orbital_entropy_2site)
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.ops.local_ops import SZ_SITE

L = 4


def _dense(mps):
    v = np.zeros(4 ** L)
    for ix, occ in enumerate(product(range(4), repeat=L)):
        v[ix] = det_coefficient(mps, occ)
    return v / np.linalg.norm(v)


def _jw_unit(t, p, r, quanta):
    """Dense E_{pr} at site t, JW-dressed (Z string to the right for
    parity-odd units) — independent of the engine's decomposition."""
    unit = np.zeros((4, 4))
    unit[p, r] = 1.0
    par = (quanta[p][0] - quanta[r][0]) % 2
    z = np.diag([(-1.0) ** q[0] for q in quanta])
    mats = [unit if u == t else (z if (par and u > t) else np.eye(4))
            for u in range(L)]
    out = mats[0]
    for m in mats[1:]:
        out = np.kron(out, m)
    return out


def test_orbital_entropy_2site_dense():
    sq = [SZ_SITE.quanta(0) for _ in range(L)]
    info = MPSInfo(SZ_GROUP, sq, (2, 0, 0), 8)
    mps = MPS.random(info, seed=3)
    v = _dense(mps)
    quanta = sq[0]
    s2, minfo = orbital_entropy_2site(mps)
    s1 = orbital_entropy_1site(mps)
    for i in range(L):
        for j in range(i + 1, L):
            rho = np.zeros((16, 16))
            for p in range(4):
                for r in range(4):
                    Ei = _jw_unit(i, p, r, quanta)
                    for q in range(4):
                        for s in range(4):
                            Ej = _jw_unit(j, q, s, quanta)
                            rho[p * 4 + q, r * 4 + s] = v @ (Ei @ (Ej @ v))
            rho = (rho + rho.T) / 2
            w = np.clip(np.linalg.eigvalsh(rho), 1e-300, 1.0)
            want = float(-(w * np.log(w)).sum())
            assert abs(s2[i, j] - want) < 1e-9, (i, j, s2[i, j], want)
            want_mi = 0.5 * (s1[i] + s1[j] - want)
            assert abs(minfo[i, j] - want_mi) < 1e-9
