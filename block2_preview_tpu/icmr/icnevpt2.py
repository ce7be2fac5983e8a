"""Fully internally contracted NEVPT2 (Dyall H0) and MRREPT2 (Fink H0).

Reference: pyblock2/icmr/icnevpt2_full.py and icmrrept2_full.py (Wick
engine derivations).  The first-order wavefunction is expanded in the
internally contracted basis { O |Psi0> } with O the 1-/2-body
excitations carrying at least one external index (the same operator
classes as ic-MRCISD, icmr/icmrcisd.py).  Perturber blocks group by the
EXTERNAL occupation pattern (n_core_labels, n_virt_labels) — the 8
NEVPT2 V(k) spaces; within a pattern all external labels and operator
classes are solved JOINTLY (exact for H0s that couple labels, e.g.
Fink's retained two-body core terms):

    E2 = - rhs^+ M^{-1} rhs,   M = <A^+ (H0 - E0) B>,
    rhs_A = <Psi0| A^+ H |Psi0>,   E0 = <Psi0|H0|Psi0>

with the metric's null space projected out (canonical
orthogonalization).

Anchors: ncas=0 reduces to MP2; a single-determinant CAS makes the IC
basis span the uncontracted space, so E2 equals the exact uncontracted
NEVPT2/REPT2 (uc/nevpt2.mrpt2_energy); for correlated CAS the Hylleraas
bound gives |E2_sc| <= |E2_ic| <= |E2_uc|.
"""

from __future__ import annotations

import itertools
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core.fcidump import FCIDUMP
from ..core.integral_dyall import dyall_fcidump, fink_fcidump
from ..uc.nevpt2 import casci_root
from . import mrwick as mw
from .icmrcisd import _build_class
from .scnevpt2 import _space_terms, active_gammas, tag_full

# IC operator classes per external pattern (n_core, n_virt)
PATTERN_CLASSES: Dict[Tuple[int, int], List] = {
    (1, 1): [(("v",), ("c",)), (("v", "a"), ("c", "a"))],
    (1, 0): [(("a",), ("c",)), (("a", "a"), ("c", "a"))],
    (0, 1): [(("v",), ("a",)), (("v", "a"), ("a", "a"))],
    (2, 0): [(("a", "a"), ("c", "c"))],
    (0, 2): [(("v", "v"), ("a", "a"))],
    (2, 1): [(("v", "a"), ("c", "c"))],
    (1, 2): [(("v", "v"), ("c", "a"))],
    (2, 2): [(("v", "v"), ("c", "c"))],
}

PATTERN_NAMES = {(2, 2): "V(0)", (1, 0): "V(+1)", (2, 0): "V(+2)",
                 (0, 1): "V(-1)", (0, 2): "V(-2)", (1, 1): "V(0')",
                 (2, 1): "V(+1')", (1, 2): "V(-1')"}


def ic_nevpt2_full(fd: FCIDUMP, ncore: int, ncas: int,
                   h0: str = "dyall",
                   gammas: Optional[Dict[str, np.ndarray]] = None,
                   s_tol: float = 1e-8, iprint: int = 0,
                   method: str = "ortho"):
    """Returns (E2, E_casci, per-pattern dict).

    method: 'ortho' solves each perturber block in the canonically
    orthogonalized basis (reference icnevpt2_ortho.py / iccmrrept2_ortho
    strategy); 'full' solves the generalized system in the raw
    internally contracted basis via a min-norm least-squares (reference
    icnevpt2_full.py CG in the non-orthogonal basis).  Both agree to
    numerical precision — the null directions of the metric carry no
    right-hand side."""
    n = fd.n_sites
    e_cas, c0m, ix, mask = casci_root(fd, ncore, ncas)
    if gammas is None:
        psi0 = np.zeros(4 ** n)
        psi0[ix[mask]] = c0m
        kmax = min(5, 2 * ncas) if ncas else 0
        gammas = active_gammas(psi0, n, ncore, ncas, kmax=kmax)
    nact = 2 * ncas
    for k in range(1, 6):
        # orders beyond the active-space electron count vanish but are
        # still looked up by the evaluator
        gammas.setdefault(f"g{k}", np.zeros((nact,) * (2 * k)))
    if ncas:
        g1 = gammas["g1"]
        rdm1_sp = g1[0::2, 0::2] + g1[1::2, 1::2]
    else:
        rdm1_sp = None
    if h0 == "dyall":
        fd0 = dyall_fcidump(fd, ncore, ncas, rdm1_active=rdm1_sp)
    elif h0 == "fink":
        fd0 = fink_fcidump(fd, ncore, ncas)
    else:
        raise ValueError("h0 must be dyall | fink")

    h_so, v_as = mw.spin_orbital_integrals(fd.h1e, fd.g2e)
    h0_so, v0_as = mw.spin_orbital_integrals(fd0.h1e, fd0.g2e)
    tensors = {"h": h_so, "v": v_as, "hd": h0_so, "vd": v0_as}
    tensors.update(gammas)
    loc = 2 * ncore
    locals_ = ("g1", "g2", "g3", "g4", "g5")

    cores = np.arange(2 * ncore)
    virts = np.arange(2 * (ncore + ncas), 2 * n)

    def range_of(sym: str) -> np.ndarray:
        c = sym[0]
        if c == "A":
            return np.arange(loc, loc + nact)
        if c == "X":
            return np.asarray([int(sym.split("_")[0][2:])])
        if c == "C":
            return cores
        if c == "V":
            return virts
        raise KeyError(sym)

    # full H and H0 as space-expanded term lists (tagged full ranges)
    sp1 = list(itertools.product((mw.CORE, mw.ACTIVE, mw.VIRT), repeat=2))
    sp2 = list(itertools.product((mw.CORE, mw.ACTIVE, mw.VIRT), repeat=4))
    ht = tag_full(_space_terms("h", "v", sp1, sp2))
    h0t = tag_full(_space_terms("hd", "vd", sp1, sp2))

    e0 = mw.evaluate(mw.mr_expect(mw.mul_terms(h0t)), tensors, range_of,
                     local_names=locals_, local_offset=loc)
    const0 = fd0.const_e

    res: Dict[str, float] = {}
    e2 = 0.0
    tag = 0
    for pat, classes in PATTERN_CLASSES.items():
        nc, nv = pat
        if nc > 2 * ncore or nv > 2 * (n - ncore - ncas):
            continue
        fns = []
        for (cre, ann) in classes:
            for lc in itertools.combinations(cores.tolist(), nc):
                for lv in itertools.combinations(virts.tolist(), nv):
                    fns.append(_build_class(cre, ann, lc, lv, tag))
                    tag += 1
        if not fns:
            continue
        sizes = [nact ** len(f.free) for f in fns]
        keep_fns = [i for i, s in enumerate(sizes) if s > 0]
        fns = [fns[i] for i in keep_fns]
        sizes = [sizes[i] for i in keep_fns]
        if not fns:
            continue
        offs = np.concatenate([[0], np.cumsum(sizes)])
        dim = int(offs[-1])
        if dim == 0:
            continue
        S = np.zeros((dim, dim))
        M = np.zeros((dim, dim))
        rhs = np.zeros(dim)
        for a, fa in enumerate(fns):
            Ad = mw.conj_terms(fa.terms)
            rv = mw.evaluate_tensor(
                mw.mr_expect(mw.mul_terms(Ad, ht)), tensors, range_of,
                [f + "_0" for f in fa.free], local_names=locals_,
                local_offset=loc)
            rhs[offs[a]:offs[a + 1]] = np.asarray(rv).ravel()
            for b, fb in enumerate(fns):
                if b < a:
                    continue
                free_s = [f + "_0" for f in fa.free] + \
                    [f + "_1" for f in fb.free]
                free_h = [f + "_0" for f in fa.free] + \
                    [f + "_2" for f in fb.free]
                sv = np.asarray(mw.evaluate_tensor(
                    mw.mr_expect(mw.mul_terms(Ad, fb.terms)), tensors,
                    range_of, free_s, local_names=locals_,
                    local_offset=loc))
                hv = np.asarray(mw.evaluate_tensor(
                    mw.mr_expect(mw.mul_terms(Ad, h0t, fb.terms)),
                    tensors, range_of, free_h, local_names=locals_,
                    local_offset=loc))
                na, nb = sizes[a], sizes[b]
                sv = sv.reshape(na, nb)
                # <A+ (H0 - E0) B>: both H0 and E0 carry the same
                # integral constant, so it cancels — e0 is the
                # constant-free <Psi0|H0_op|Psi0>
                hv = hv.reshape(na, nb) - e0 * sv
                S[offs[a]:offs[a + 1], offs[b]:offs[b + 1]] = sv
                M[offs[a]:offs[a + 1], offs[b]:offs[b + 1]] = hv
                if b != a:
                    S[offs[b]:offs[b + 1], offs[a]:offs[a + 1]] = sv.T
                    M[offs[b]:offs[b + 1], offs[a]:offs[a + 1]] = hv.T
        if method == "ortho":
            w, U = np.linalg.eigh(0.5 * (S + S.T))
            keep = w > s_tol * max(w.max(), 1.0)
            if not np.any(keep):
                continue
            X = U[:, keep] / np.sqrt(w[keep])
            Mp = X.T @ (0.5 * (M + M.T)) @ X
            y = X.T @ rhs
            z = np.linalg.solve(Mp, y)
            e2p = -float(y @ z)
        elif method == "full":
            # raw-basis generalized solve: min-norm lstsq of M z = rhs;
            # the metric's null space (shared by M on the physical
            # block) is annihilated by the rcond cut
            Msym = 0.5 * (M + M.T)
            z = np.linalg.lstsq(Msym, rhs, rcond=s_tol)[0]
            e2p = -float(rhs @ z)
        else:
            raise ValueError("method must be ortho | full")
        name = PATTERN_NAMES[pat]
        res[name] = res.get(name, 0.0) + e2p
        e2 += e2p
        if iprint:
            print(f"{name:8s} dim {dim:5d} kept {int(keep.sum()):5d} "
                  f"E2 = {e2p:.10f}")
    return e2, e_cas, res
