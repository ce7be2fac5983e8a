"""Spin-free (spatial-RDM) fully internally contracted MRCISD.

Spin-free counterpart of icmr/icmrcisd.py (reference
pyblock2/icmr/icmrcisd_full.py): the variational space is
{ |Psi0> } u { E-operator products with at least one external index },
all matrix elements evaluated over SPIN-TRACED spatial RDMs
(icmr/sfwick.py) — G5 at worst (semi-internal x H x semi-internal),
ncas^10 memory instead of the spin-orbital (2 ncas)^10.
"""

from __future__ import annotations

import itertools
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core.fcidump import FCIDUMP
from ..uc.nevpt2 import casci_root
from . import mrwick as mw
from .icnevpt2_sf import SF_CLASSES, _SPACE_OF, _build_fn
from .scnevpt2 import active_gammas, tag_full
from .sfwick import sf_hamiltonian, spatialize_sf
from .spatialize import spin_trace_gammas


def ic_mrcisd_sf(fd: FCIDUMP, ncore: int, ncas: int,
                 gammas_spatial: Optional[Dict[str, np.ndarray]] = None,
                 s_tol: float = 1e-8, iprint: int = 0):
    """Returns (E_icmrcisd, E_casci, kept dimension)."""
    n = fd.n_sites
    nvirt = n - ncore - ncas
    e_cas, c0m, ix, mask = casci_root(fd, ncore, ncas)
    kmax = min(5, 2 * ncas) if ncas else 0
    if gammas_spatial is None:
        psi0 = np.zeros(4 ** n)
        psi0[ix[mask]] = c0m
        g_so = active_gammas(psi0, n, ncore, ncas, kmax=kmax)
        gammas_spatial = spin_trace_gammas(g_so, kmax=kmax)
    for k in range(1, 6):
        gammas_spatial.setdefault(f"G{k}", np.zeros((ncas,) * (2 * k)))

    tensors = {"h": fd.h1e, "vp": fd.g2e.transpose(0, 2, 1, 3)}
    tensors.update(gammas_spatial)
    loc = ncore
    locals_ = tuple(f"G{k}" for k in range(1, 6))
    cores = np.arange(ncore)
    virts = np.arange(ncore + ncas, n)
    acts = np.arange(ncore, ncore + ncas)

    def range_of(sym: str) -> np.ndarray:
        c = sym[0]
        if c == "A":
            return acts
        if c == "X":
            return np.asarray([int(sym.split("_")[0][2:])])
        if c == "C":
            return cores
        if c == "V":
            return virts
        raise KeyError(sym)

    ht = tag_full(sf_hamiltonian("h", "vp"))

    fns: List[Tuple[List, Tuple[str, ...]]] = []
    tag = 0
    for pat, families in SF_CLASSES.items():
        nc, nv = pat
        if nc > 2 * ncore or nv > 2 * nvirt or (nc and not ncore) \
                or (nv and not nvirt):
            continue
        for spec in families:
            n_act = sum(1 for pq in spec for x in pq
                        if _SPACE_OF[x] == "a")
            if ncas == 0 and n_act > 0:
                continue
            for lc in itertools.combinations_with_replacement(
                    cores.tolist(), nc):
                for lv in itertools.combinations_with_replacement(
                        virts.tolist(), nv):
                    fns.append(_build_fn(spec, lc, lv, tag))
                    tag += 1
    sizes = [max(ncas ** len(f[1]), 0) for f in fns]
    keep = [i for i, s in enumerate(sizes) if s > 0]
    fns = [fns[i] for i in keep]
    sizes = [sizes[i] for i in keep]
    offs = np.concatenate([[1], 1 + np.cumsum(sizes)])
    dim = int(offs[-1])
    H = np.zeros((dim, dim))
    S = np.zeros((dim, dim))
    S[0, 0] = 1.0
    H[0, 0] = mw.evaluate(
        spatialize_sf(mw.mr_expect(mw.mul_terms(ht))), tensors,
        range_of, local_names=locals_, local_offset=loc)
    for a, (ta, fa) in enumerate(fns):
        Ad = mw.conj_terms(ta)
        he = np.asarray(mw.evaluate_tensor(
            spatialize_sf(mw.mr_expect(mw.mul_terms(ht, ta))),
            tensors, range_of, [f + "_1" for f in fa],
            local_names=locals_, local_offset=loc)).ravel()
        H[0, offs[a]:offs[a + 1]] = he
        H[offs[a]:offs[a + 1], 0] = he
        for b, (tb, fb) in enumerate(fns):
            if b < a:
                continue
            free_s = [f + "_0" for f in fa] + [f + "_1" for f in fb]
            free_h = [f + "_0" for f in fa] + [f + "_2" for f in fb]
            sv = np.asarray(mw.evaluate_tensor(
                spatialize_sf(mw.mr_expect(mw.mul_terms(Ad, tb))),
                tensors, range_of, free_s, local_names=locals_,
                local_offset=loc)).reshape(sizes[a], sizes[b])
            hv = np.asarray(mw.evaluate_tensor(
                spatialize_sf(mw.mr_expect(mw.mul_terms(Ad, ht, tb))),
                tensors, range_of, free_h, local_names=locals_,
                local_offset=loc)).reshape(sizes[a], sizes[b])
            S[offs[a]:offs[a + 1], offs[b]:offs[b + 1]] = sv
            H[offs[a]:offs[a + 1], offs[b]:offs[b + 1]] = hv
            if b != a:
                S[offs[b]:offs[b + 1], offs[a]:offs[a + 1]] = sv.T
                H[offs[b]:offs[b + 1], offs[a]:offs[a + 1]] = hv.T
    w, U = np.linalg.eigh(0.5 * (S + S.T))
    keepm = w > s_tol * max(w.max(), 1.0)
    X = U[:, keepm] / np.sqrt(w[keepm])
    Hp = X.T @ (0.5 * (H + H.T)) @ X
    ev = np.linalg.eigvalsh(Hp)
    if iprint:
        print(f"ic-MRCISD(sf) dim {dim} kept {int(keepm.sum())} "
              f"E = {ev[0] + fd.const_e:.10f}")
    return ev[0] + fd.const_e, e_cas, int(keepm.sum())
