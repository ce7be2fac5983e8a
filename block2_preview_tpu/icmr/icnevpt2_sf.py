"""Spin-free (spatial-RDM) fully internally contracted NEVPT2.

The production counterpart of icmr/icnevpt2.py: perturber operators are
built from spin-summed excitations E_pq (icmr/sfwick.py), so every
expectation collapses onto SPIN-TRACED spatial RDMs G1..G4 — ncas^8
memory for the highest order (the Dyall eigenstate property keeps the
commutator form at 4-RDM), matching the reference's spin-free
derivation (pyblock2/icmr/icnevpt2_full.py).  For a singlet reference
the spin-free basis spans the same first-order interacting space as the
spin-orbital contracted basis, so E2 agrees with icnevpt2.py exactly.
"""

from __future__ import annotations

import itertools
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core.fcidump import FCIDUMP
from ..core.integral_dyall import dyall_fcidump, fink_fcidump
from ..uc.nevpt2 import casci_root
from . import mrwick as mw
from .mrwick import ACTIVE, CORE, VIRT, MOp, MTerm
from .scnevpt2 import active_gammas
from .sfwick import sf_dyall, sf_hamiltonian, spatialize_sf
from .spatialize import spin_trace_gammas

# spin-free basis families per external pattern (n_core, n_virt):
# each family is a list of E_pq slot specs using letters
#   'i','j' fixed core; 'r','s' fixed virt; 'a','b','c' free active
SF_CLASSES: Dict[Tuple[int, int], List[List[Tuple[str, str]]]] = {
    (2, 2): [[("r", "i"), ("s", "j")], [("r", "j"), ("s", "i")]],
    (1, 0): [[("a", "i")], [("a", "i"), ("b", "c")],
             [("a", "c"), ("b", "i")]],
    (0, 1): [[("r", "a")], [("r", "a"), ("b", "c")],
             [("r", "c"), ("b", "a")]],
    (2, 0): [[("a", "i"), ("b", "j")], [("a", "j"), ("b", "i")]],
    (0, 2): [[("r", "a"), ("s", "b")], [("r", "b"), ("s", "a")]],
    (2, 1): [[("r", "i"), ("a", "j")], [("r", "j"), ("a", "i")]],
    (1, 2): [[("r", "i"), ("s", "a")], [("s", "i"), ("r", "a")]],
    (1, 1): [[("r", "i")], [("r", "i"), ("a", "b")],
             [("r", "a"), ("b", "i")]],
}

PATTERN_NAMES = {(2, 2): "V(0)", (1, 0): "V(+1)", (2, 0): "V(+2)",
                 (0, 1): "V(-1)", (0, 2): "V(-2)", (1, 1): "V(0')",
                 (2, 1): "V(+1')", (1, 2): "V(-1')"}

_SPACE_OF = {"i": CORE, "j": CORE, "r": VIRT, "s": VIRT,
             "a": ACTIVE, "b": ACTIVE, "c": ACTIVE}


def _build_fn(spec: List[Tuple[str, str]], core_lab, virt_lab, tag: int):
    """One contracted basis operator: product of E_pq with fixed
    external labels and free active symbols.  Returns (terms, free)."""
    core_map = {}
    virt_map = {}
    for x in ("i", "j"):
        if any(x in pq for pq in spec):
            core_map[x] = core_lab[len(core_map)]
    for x in ("r", "s"):
        if any(x in pq for pq in spec):
            virt_map[x] = virt_lab[len(virt_map)]
    ops = []
    tens = []
    free = []
    for e, (p, q) in enumerate(spec):
        names = []
        for x in (p, q):
            sp = _SPACE_OF[x]
            if sp == CORE:
                nm = f"Xc{core_map[x]}_{tag}e{e}{x}"
            elif sp == VIRT:
                nm = f"Xv{virt_map[x]}_{tag}e{e}{x}"
            else:
                nm = f"Af{x}_{tag}e{e}"
                free.append(nm)
            names.append((nm, sp))
        (pn, psp), (qn, qsp) = names
        tens.append(("spinlink", (pn, qn)))
        ops += [MOp(pn, psp, True), MOp(qn, qsp, False)]
    return [MTerm(1.0, tuple(tens), tuple(ops))], tuple(free)


def ic_nevpt2_sf(fd: FCIDUMP, ncore: int, ncas: int, h0: str = "dyall",
                 gammas_spatial: Optional[Dict[str, np.ndarray]] = None,
                 s_tol: float = 1e-8, iprint: int = 0):
    """Spatial-RDM ic-NEVPT2(full) / ic-MRREPT2.  Returns
    (E2, E_casci, per-pattern dict).

    gammas_spatial: spin-traced G1..G4 (G5 for h0='fink'), e.g. from
    the polynomial spatial NPDM engine on a DMRG CAS MPS; computed from
    the determinant-space CASCI root when omitted."""
    n = fd.n_sites
    nvirt = n - ncore - ncas
    e_cas, c0m, ix, mask = casci_root(fd, ncore, ncas)
    kmax = 4 if h0 == "dyall" else 5
    if gammas_spatial is None:
        psi0 = np.zeros(4 ** n)
        psi0[ix[mask]] = c0m
        g_so = active_gammas(psi0, n, ncore, ncas,
                             kmax=min(kmax, 2 * ncas) if ncas else 0)
        gammas_spatial = spin_trace_gammas(g_so, kmax=kmax)
    for k in range(1, kmax + 1):
        gammas_spatial.setdefault(f"G{k}", np.zeros((ncas,) * (2 * k)))
    rdm1_sp = gammas_spatial["G1"] if ncas else None
    if h0 == "dyall":
        fd0 = dyall_fcidump(fd, ncore, ncas, rdm1_active=rdm1_sp)
    elif h0 == "fink":
        fd0 = fink_fcidump(fd, ncore, ncas)
    else:
        raise ValueError("h0 must be dyall | fink")

    tensors = {"h": fd.h1e, "vp": fd.g2e.transpose(0, 2, 1, 3),
               "hd": fd0.h1e, "vdp": fd0.g2e.transpose(0, 2, 1, 3)}
    tensors.update(gammas_spatial)
    loc = ncore
    locals_ = tuple(f"G{k}" for k in range(1, kmax + 1))

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

    from .scnevpt2 import tag_full
    ht = tag_full(sf_hamiltonian("h", "vp"))
    h0t = tag_full(sf_dyall("hd", "vdp"))

    e0 = mw.evaluate(spatialize_sf(mw.mr_expect(mw.mul_terms(h0t))),
                     tensors, range_of, local_names=locals_,
                     local_offset=loc)
    use_comm = (h0 == "dyall")

    res: Dict[str, float] = {}
    e2 = 0.0
    tag = 0
    for pat, families in SF_CLASSES.items():
        nc, nv = pat
        # spatial labels repeat (a doubly-ionized core orbital is (i,i)),
        # so the bound is on ELECTRONS, not labels
        if nc > 2 * ncore or nv > 2 * nvirt or (nc and not ncore) \
                or (nv and not nvirt):
            continue
        fns = []
        for spec in families:
            n_act = sum(1 for pq in spec for x in pq
                        if _SPACE_OF[x] == ACTIVE)
            if ncas == 0 and n_act > 0:
                continue
            for lc in itertools.combinations_with_replacement(
                    cores.tolist(), nc):
                for lv in itertools.combinations_with_replacement(
                        virts.tolist(), nv):
                    terms, free = _build_fn(spec, lc, lv, tag)
                    fns.append((terms, free))
                    tag += 1
        if not fns:
            continue
        sizes = [ncas ** len(f[1]) for f in fns]
        keep = [i for i, s in enumerate(sizes) if s > 0]
        fns = [fns[i] for i in keep]
        sizes = [sizes[i] for i in keep]
        if not fns:
            continue
        offs = np.concatenate([[0], np.cumsum(sizes)])
        dim = int(offs[-1])
        S = np.zeros((dim, dim))
        M = np.zeros((dim, dim))
        rhs = np.zeros(dim)
        for a, (ta, fa) in enumerate(fns):
            Ad = mw.conj_terms(ta)
            rv = mw.evaluate_tensor(
                spatialize_sf(mw.mr_expect(mw.mul_terms(Ad, ht))),
                tensors, range_of, [f + "_0" for f in fa],
                local_names=locals_, local_offset=loc)
            rhs[offs[a]:offs[a + 1]] = np.asarray(rv).ravel()
            for b, (tb, fb) in enumerate(fns):
                if b < a:
                    continue
                free_s = [f + "_0" for f in fa] + [f + "_1" for f in fb]
                # commutator_terms pre-renames its A factor with "_ca"
                free_h = [f + "_0" for f in fa] + \
                    ([f + "_ca_1" for f in fb] if use_comm
                     else [f + "_2" for f in fb])
                sv = np.asarray(mw.evaluate_tensor(
                    spatialize_sf(mw.mr_expect(mw.mul_terms(Ad, tb))),
                    tensors, range_of, free_s, local_names=locals_,
                    local_offset=loc))
                if use_comm:
                    comm = mw.commutator_terms(h0t, tb)
                    hv = np.asarray(mw.evaluate_tensor(
                        spatialize_sf(mw.mr_expect(
                            mw.mul_terms(Ad, comm))),
                        tensors, range_of, free_h, local_names=locals_,
                        local_offset=loc))
                    hv = hv.reshape(sizes[a], sizes[b])
                else:
                    hv = np.asarray(mw.evaluate_tensor(
                        spatialize_sf(mw.mr_expect(
                            mw.mul_terms(Ad, h0t, tb))),
                        tensors, range_of, free_h, local_names=locals_,
                        local_offset=loc))
                    hv = hv.reshape(sizes[a], sizes[b]) \
                        - e0 * sv.reshape(sizes[a], sizes[b])
                sv = sv.reshape(sizes[a], sizes[b])
                S[offs[a]:offs[a + 1], offs[b]:offs[b + 1]] = sv
                M[offs[a]:offs[a + 1], offs[b]:offs[b + 1]] = hv
                if b != a:
                    S[offs[b]:offs[b + 1], offs[a]:offs[a + 1]] = sv.T
                    M[offs[b]:offs[b + 1], offs[a]:offs[a + 1]] = hv.T
        w, U = np.linalg.eigh(0.5 * (S + S.T))
        keepm = w > s_tol * max(w.max(), 1.0)
        if not np.any(keepm):
            continue
        X = U[:, keepm] / np.sqrt(w[keepm])
        Mp = X.T @ (0.5 * (M + M.T)) @ X
        y = X.T @ rhs
        z = np.linalg.solve(Mp, y)
        e2p = -float(y @ z)
        name = PATTERN_NAMES[pat]
        res[name] = res.get(name, 0.0) + e2p
        e2 += e2p
        if iprint:
            print(f"{name:8s} dim {dim:5d} kept {int(keepm.sum()):5d} "
                  f"E2 = {e2p:.10f}")
    return e2, e_cas, res
