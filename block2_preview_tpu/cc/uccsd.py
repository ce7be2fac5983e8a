"""UHF coupled cluster: UCCSD / UCCSD(T), spin-orbital and spatial.

Two tiers (reference pyblock2/cc/uccsd.py — WickUCCSD, the machine-
derived UHF/CCSD(+T) over spatial orbitals; the reference builds on
pyscf's UCCSD driver, absent in this image, so the solver here is
self-contained):

1. `uccsd` / `uccsd_t`: the spin-orbital GCCSD/(T) kernels fed with
   UHF-sectioned integrals (uc/mp.uhf_spin_orbital_integrals) — the
   exact unrestricted solution and the referee for tier 2.
2. `UCCSDSpatial`: machine-generated SPIN-BLOCKED spatial equations.
   The spin-orbital residual expressions (cc/wick_cc._gen_expr) are
   expanded branch-by-branch exactly like the closed-shell spin
   summation (cc/rccsd_eq), but instead of summing free spin chains
   (valid only when both spins share one set of spatial orbitals and
   amplitudes), every spin class is ENUMERATED over {alpha, beta} and
   each factor is tagged with its spin signature — yielding terms over
   the blocked tensors Fa/Fb, Vaa/Vab/Vba/Vbb, T1a/T1b,
   T2aa/T2ab/T2bb.  Amplitude blocks: t1a[i,a], t1b, t2aa (antisym,
   evaluated through the generating tensor T2_00 = t2aa/2 — the
   branch expansion t2so = T[abij] - T[abji] then reproduces the
   antisymmetric block exactly), t2ab (plain mixed), t2bb.

Validation: tier-2 energies equal tier-1 at 1e-8 on UHF systems
(tests/test_uccsd.py)."""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core.fcidump import FCIDUMP
from ..uc.mp import uhf_energy_and_fock
from .gccsd import ccsd_t, gccsd
from .rccsd_eq import _UF, _bch_projected, _einsum_spec, _expand_factors
from ..ic.wick import OCC, VIR, space_of
from .wick_cc import _deex_ops


# ---------------------------------------------------------------------------
# tier 1: spin-orbital kernels on UHF integrals
# ---------------------------------------------------------------------------


def uccsd(fd: FCIDUMP, return_amplitudes: bool = False, **kw):
    """Unrestricted CCSD via the spin-orbital kernel on UHF-sectioned
    integrals.  Returns (E_HF, E_corr)[, t1, t2] in the occupied-first
    spin-orbital ordering."""
    hf = uhf_energy_and_fock(fd)
    return gccsd(fd, hf=hf, n_elec=fd.n_elec,
                 return_amplitudes=return_amplitudes, **kw)


def uccsd_t(fd: FCIDUMP):
    """UCCSD(T): returns (E_HF, E_CCSD_corr, E_(T))."""
    hf = uhf_energy_and_fock(fd)
    return ccsd_t(fd, hf=hf, n_elec=fd.n_elec)


def eom_ee_uccsd(fd: FCIDUMP, n_roots: int = 4):
    """EOM-EE on the UHF reference (reference pyblock2/cc/eom_uccsd.py;
    the spin-orbital WickCC machinery on UHF-sectioned integrals)."""
    from .wick_cc import WickCC
    return WickCC(fd).eom_ee(n_roots)


def eom_ip_uccsd(fd: FCIDUMP, n_roots: int = 4):
    from .wick_cc import WickCC
    return WickCC(fd).eom_ip(n_roots)


def eom_ea_uccsd(fd: FCIDUMP, n_roots: int = 4):
    from .wick_cc import WickCC
    return WickCC(fd).eom_ea(n_roots)


def lambda_uccsd(fd: FCIDUMP):
    """Lambda amplitudes on the UHF reference (reference
    lambda_uccsd.py)."""
    from .wick_cc import WickCC
    return WickCC(fd).solve_lambda()


def rdm1_uccsd(fd: FCIDUMP):
    """Spin-orbital response 1-RDM on the UHF reference; split into
    (alpha, beta) spatial blocks by the occupied-first ordering of
    uc/mp.uhf_spin_orbital_integrals (reference rdm_uccsd.py)."""
    from ..uc.mp import uhf_spin_orbital_integrals
    from .wick_cc import WickCC
    d1 = WickCC(fd).rdm1()
    _h, _v, spin = uhf_spin_orbital_integrals(fd)
    a = np.where(spin == 0)[0]
    b = np.where(spin == 1)[0]
    return d1[np.ix_(a, a)], d1[np.ix_(b, b)]


# ---------------------------------------------------------------------------
# tier 2: spin-blocked spatial equations
# ---------------------------------------------------------------------------


def spin_block_terms(expr, ext, ext_spins):
    """Expand a spin-orbital Wick expression into SPIN-BLOCKED spatial
    terms.  Like rccsd_eq.spin_sum but free spin classes are enumerated
    over {0, 1} and every factor is tagged with the spins of its index
    classes: returns merged terms (coeff, [(tag, idx_tuple)], ext_labels)
    with tags like 'F:0', 'V:01', 'T1:1', 'T2:01'."""
    spin_of_ext = dict(zip(ext, ext_spins))
    out: Dict[Tuple, float] = {}
    for term in expr.terms:
        for coeff, facs, links in _expand_factors(term):
            uf = _UF()
            for (x, y) in links:
                uf.union(x, y)
            fixed: Dict[str, int] = {}
            dead = False
            for e, sp in spin_of_ext.items():
                r = uf.find(e)
                if r in fixed and fixed[r] != sp:
                    dead = True
                    break
                fixed[r] = sp
            if dead:
                continue
            all_idx = set()
            for _n, ixs in facs:
                all_idx.update(ixs)
            free = sorted({uf.find(x) for x in all_idx} - set(fixed))
            # spatial identification (contraction deltas)
            sf = _UF()
            cls_forced: Dict[str, str] = {}
            for name, ixs in facs:
                if name in ("EQ_O", "EQ_V"):
                    sf.union(ixs[0], ixs[1])
            for name, ixs in facs:
                forced = {"EQ_O": "o", "EQ_V": "v"}.get(name)
                for x in ixs:
                    sp = space_of(x)
                    tag = forced or ("o" if sp == OCC
                                     else ("v" if sp == VIR else None))
                    if tag is None:
                        continue
                    r = sf.find(x)
                    if cls_forced.get(r, tag) != tag:
                        dead = True
                    cls_forced[r] = tag
            if dead:
                continue
            # NOTE: spin classes (uf) and spatial classes (sf) coincide
            # for every tensor index (both unions come from the same
            # delta links), so the spin of a spatial class is well
            # defined through any member.
            for assign in range(1 << len(free)):
                spins = dict(fixed)
                for b, cls in enumerate(free):
                    spins[cls] = (assign >> b) & 1

                def spin_x(x):
                    return spins[uf.find(x)]

                spat = []
                for (n, ixs) in facs:
                    if n in ("EQ_O", "EQ_V"):
                        continue
                    sig = "".join(str(spin_x(x)) for x in ixs)
                    if n == "F":
                        tag = f"F:{sig[0]}"
                    elif n == "V":
                        # physicist <pq|rs>: spins (sp, sq)
                        tag = f"V:{sig[0]}{sig[1]}"
                    elif n == "T1":
                        tag = f"T1:{sig[0]}"
                    elif n == "T2":
                        # pairing (a,i)(b,j): spins (sa, sb)
                        tag = f"T2:{sig[0]}{sig[1]}"
                    elif n == "T3":
                        tag = f"T3:{sig[0]}{sig[1]}{sig[2]}"
                    elif n in ("R1", "R2"):
                        tag = f"{n}:{sig[:len(ixs) // 2]}"
                    else:
                        raise KeyError(n)
                    spat.append((tag, tuple(sf.find(x) for x in ixs)))
                ext_cls = [sf.find(e) for e in ext]
                rename: Dict[str, str] = {}

                def nm(x):
                    if x not in rename:
                        tag = cls_forced.get(x)
                        if tag is None:
                            sp = space_of(x)
                            tag = "o" if sp == OCC else \
                                ("v" if sp == VIR else "g")
                        rename[x] = f"{tag}{len(rename)}"
                    return rename[x]

                for e in ext_cls:
                    nm(e)
                spat_n = tuple(sorted(
                    (n, tuple(nm(x) for x in ixs)) for (n, ixs) in spat))
                key = (spat_n, tuple(nm(e) for e in ext_cls))
                out[key] = out.get(key, 0.0) + coeff
    terms = []
    for (spat_n, ext_n), c in out.items():
        if abs(c) < 1e-12:
            continue
        terms.append((c, [(n, ixs) for (n, ixs) in spat_n],
                      list(ext_n)))
    return terms


_U_TERMS = None


def _uccsd_terms():
    global _U_TERMS
    if _U_TERMS is None:
        S = ("i0", "a0")
        D = ("i0", "a0", "j0", "b0")
        e0 = _bch_projected(())
        r1 = _bch_projected(_deex_ops(S))
        r2 = _bch_projected(_deex_ops(D))
        _U_TERMS = {
            "e": spin_block_terms(e0, (), ()),
            "r1a": spin_block_terms(r1, S, (0, 0)),
            "r1b": spin_block_terms(r1, S, (1, 1)),
            "r2aa": spin_block_terms(r2, D, (0, 0, 0, 0)),
            "r2ab": spin_block_terms(r2, D, (0, 0, 1, 1)),
            "r2bb": spin_block_terms(r2, D, (1, 1, 1, 1)),
        }
    return _U_TERMS


class UCCSDSpatial:
    """Spin-blocked spatial UCCSD on machine-generated equations."""

    def __init__(self, fd: FCIDUMP, max_iter: int = 200,
                 tol: float = 1e-10):
        assert fd.uhf
        self.fd = fd
        k = fd.n_sites
        self.na = (fd.n_elec + fd.twos) // 2
        self.nb = fd.n_elec - self.na
        self.no = {(0,): self.na, (1,): self.nb}
        ha, hb = fd.h1e
        vaa, vbb, vab = fd.g2e
        self.h = {"0": ha, "1": hb}
        # physicist <pq|rs> per (sp, sq) spin pair
        chem = {"00": vaa, "11": vbb, "01": vab,
                "10": vab.transpose(2, 3, 0, 1)}
        self.v = {s: c.transpose(0, 2, 1, 3) for s, c in chem.items()}
        occ = {"0": np.arange(self.na), "1": np.arange(self.nb)}
        # UHF Fock (denominators): f_s = h_s + sum_t J_t - K_s
        self.f = {}
        allk = np.arange(k)
        for s in ("0", "1"):
            fm = self.h[s].copy()
            for t in ("0", "1"):
                vst = self.v[s + t]
                fm += np.einsum("piqi->pq", vst[np.ix_(allk, occ[t],
                                                       allk, occ[t])])
            # exchange (same spin only)
            vss = self.v[s + s]
            fm -= np.einsum("piiq->pq", vss[np.ix_(allk, occ[s],
                                                   occ[s], allk)])
            self.f[s] = fm
        e_hf = (sum(np.trace(self.h[s][np.ix_(occ[s], occ[s])])
                    for s in ("0", "1"))
                + 0.5 * sum(
                    np.einsum("ijij->", self.v[s + t][np.ix_(
                        occ[s], occ[t], occ[s], occ[t])])
                    - (np.einsum("ijji->", self.v[s + t][np.ix_(
                        occ[s], occ[t], occ[t], occ[s])])
                       if s == t else 0.0)
                    for s in ("0", "1") for t in ("0", "1")))
        self.e_hf = float(e_hf) + fd.const_e
        self.max_iter = max_iter
        self.tol = tol
        self.terms = _uccsd_terms()

    # -- slices --------------------------------------------------------
    def _slice(self, tag, ixs, amps):
        name, sig = tag.split(":")
        k = self.fd.n_sites
        if name == "F":
            src = self.h[sig]
        elif name == "V":
            src = self.v[sig]
        elif name == "T1":
            return amps["t1" + ("a" if sig == "0" else "b")].T
        elif name == "T2":
            key = {"00": "t2aa", "01": "t2ab", "11": "t2bb"}.get(sig)
            if key is not None:
                t = amps[key]
                if sig in ("00", "11"):
                    t = 0.5 * t          # generating tensor for antisym
            else:                        # '10': swap the two pairs
                t = amps["t2ab"].transpose(1, 0, 3, 2)
            return t.transpose(2, 3, 0, 1)   # stored [i,j,a,b] -> (abij)
        else:
            raise KeyError(tag)
        no_s = {"0": self.na, "1": self.nb}
        # index spaces: 'o'/'v' per index with THIS tag's spin signature:
        # F: one spin for both; V: (s1, s2, s1, s2)
        if name == "F":
            spins = (sig, sig)
        else:
            spins = (sig[0], sig[1], sig[0], sig[1])
        idx = []
        for x, s in zip(ixs, spins):
            n_o = no_s[s]
            idx.append(np.arange(n_o) if x[0] == "o"
                       else np.arange(n_o, k))
        return src[np.ix_(*idx)]

    def _eval(self, terms, amps, ext_spins, out_shape):
        k = self.fd.n_sites
        no_s = {"0": self.na, "1": self.nb}
        acc = np.zeros(out_shape)
        for c, factors, ext in terms:
            # dimension of each class: first factor occurrence fixes
            # (space, spin); externals carry ext_spins by position
            dim: Dict[str, int] = {}
            for pos, x in enumerate(ext):
                s = str(ext_spins[pos])
                dim[x] = no_s[s] if x[0] == "o" else k - no_s[s]
            for tag, ixs in factors:
                name, sig = tag.split(":")
                spins = (sig, sig) if name == "F" else (
                    (sig[0], sig[1], sig[0], sig[1]) if name == "V"
                    else ((sig,) if name == "T1" and len(sig) == 1
                          else None))
                if name == "T1":
                    spins = (sig, sig)
                elif name == "T2":
                    spins = (sig[0], sig[1], sig[0], sig[1])
                for x, s in zip(ixs, spins):
                    dim.setdefault(x, no_s[s] if x[0] == "o"
                                   else k - no_s[s])
            seen = set()
            for _n, ixs in factors:
                seen.update(ixs)
            fac2 = list(factors) + [("ONE", (x,)) for x in ext
                                    if x not in seen]
            spec_in, spec_out, names, _ = _einsum_spec(fac2, ext)
            arrs = [np.ones(dim[ixs[0]]) if n == "ONE"
                    else self._slice(n, ixs, amps)
                    for (n, ixs) in names]
            acc += c * np.einsum(spec_in + "->" + spec_out, *arrs,
                                 optimize=True)
        return acc

    def kernel(self, return_amplitudes: bool = False):
        k = self.fd.n_sites
        na, nb = self.na, self.nb
        nva, nvb = k - na, k - nb
        ea = np.diag(self.f["0"])
        eb = np.diag(self.f["1"])

        def dd(eo, ev):
            d = eo[:, None] - ev[None, :]
            return np.where(np.abs(d) < 1e-10, -1.0, d)

        d1a = dd(ea[:na], ea[na:])
        d1b = dd(eb[:nb], eb[nb:])

        def d2(e1o, e1v, e2o, e2v):
            d = (e1o[:, None, None, None] + e2o[None, :, None, None]
                 - e1v[None, None, :, None] - e2v[None, None, None, :])
            return np.where(np.abs(d) < 1e-10, -1.0, d)

        d2aa = d2(ea[:na], ea[na:], ea[:na], ea[na:])
        d2ab = d2(ea[:na], ea[na:], eb[:nb], eb[nb:])
        d2bb = d2(eb[:nb], eb[nb:], eb[:nb], eb[nb:])
        amps = {
            "t1a": self.f["0"][:na, na:] / d1a,
            "t1b": self.f["1"][:nb, nb:] / d1b,
            "t2aa": np.zeros((na, na, nva, nva)),
            "t2ab": self.v["01"][:na, :nb, na:, nb:]
            .transpose(0, 1, 2, 3) / d2ab.transpose(0, 1, 2, 3),
            "t2bb": np.zeros((nb, nb, nvb, nvb)),
        }
        vaa_p = self.v["00"]
        amps["t2aa"] = (vaa_p[:na, :na, na:, na:]
                        - vaa_p[:na, :na, na:, na:].transpose(0, 1, 3, 2)
                        ) / d2aa
        vbb_p = self.v["11"]
        amps["t2bb"] = (vbb_p[:nb, :nb, nb:, nb:]
                        - vbb_p[:nb, :nb, nb:, nb:].transpose(0, 1, 3, 2)
                        ) / d2bb
        z = {kk: 0 * vv for kk, vv in amps.items()}
        e_ref = float(self._eval(self.terms["e"], z, (), ()))
        e_last = None
        diis_t: List[np.ndarray] = []
        diis_r: List[np.ndarray] = []
        shapes = {kk: vv.shape for kk, vv in amps.items()}
        keys = ["t1a", "t1b", "t2aa", "t2ab", "t2bb"]
        for _it in range(self.max_iter):
            r1a = self._eval(self.terms["r1a"], amps, (0, 0), (na, nva))
            r1b = self._eval(self.terms["r1b"], amps, (1, 1), (nb, nvb))
            r2aa = self._eval(self.terms["r2aa"], amps, (0, 0, 0, 0),
                              (na, nva, na, nva)).transpose(0, 2, 1, 3)
            r2ab = self._eval(self.terms["r2ab"], amps, (0, 0, 1, 1),
                              (na, nva, nb, nvb)).transpose(0, 2, 1, 3)
            r2bb = self._eval(self.terms["r2bb"], amps, (1, 1, 1, 1),
                              (nb, nvb, nb, nvb)).transpose(0, 2, 1, 3)
            new = {
                "t1a": amps["t1a"] + r1a / d1a,
                "t1b": amps["t1b"] + r1b / d1b,
                "t2aa": amps["t2aa"] + r2aa / d2aa,
                "t2ab": amps["t2ab"] + r2ab / d2ab,
                "t2bb": amps["t2bb"] + r2bb / d2bb,
            }
            # same-spin blocks live in the antisymmetric symmetry type
            for s in ("t2aa", "t2bb"):
                t = new[s]
                new[s] = 0.25 * (t - t.transpose(1, 0, 2, 3)
                                 - t.transpose(0, 1, 3, 2)
                                 + t.transpose(1, 0, 3, 2))
            tv = np.concatenate([new[kk].ravel() for kk in keys])
            rv = tv - np.concatenate([amps[kk].ravel() for kk in keys])
            diis_t.append(tv)
            diis_r.append(rv)
            if len(diis_t) > 8:
                diis_t.pop(0)
                diis_r.pop(0)
            if len(diis_t) >= 2:
                nd = len(diis_r)
                B = np.empty((nd + 1, nd + 1))
                B[-1, :] = B[:, -1] = -1.0
                B[-1, -1] = 0.0
                for a in range(nd):
                    for b in range(nd):
                        B[a, b] = float(np.dot(diis_r[a], diis_r[b]))
                rhs = np.zeros(nd + 1)
                rhs[-1] = -1.0
                try:
                    cv = np.linalg.solve(B + 1e-12 * np.eye(nd + 1),
                                         rhs)[:nd]
                    tv = sum(c * td for c, td in zip(cv, diis_t))
                except np.linalg.LinAlgError:
                    pass
            o = 0
            for kk in keys:
                n = int(np.prod(shapes[kk]))
                amps[kk] = tv[o:o + n].reshape(shapes[kk])
                o += n
            e = float(self._eval(self.terms["e"], amps, (), ())) - e_ref
            if e_last is not None and abs(e - e_last) < self.tol:
                e_last = e
                break
            e_last = e
        if return_amplitudes:
            return self.e_hf, float(e_last), amps
        return self.e_hf, float(e_last)


def uccsd_spatial(fd: FCIDUMP, return_amplitudes: bool = False):
    """Spin-blocked spatial UCCSD (reference pyblock2/cc/uccsd.py)."""
    return UCCSDSpatial(fd).kernel(return_amplitudes)
