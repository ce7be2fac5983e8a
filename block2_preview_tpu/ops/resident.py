"""Device-resident site pipeline: mix (assembly) + slab matvec + diag.

The host<->device link on the target system is slow (~10 MB/s tunnel,
80 ms round trip), so the per-site pipeline must never move environment
pools or effective operators through the host.  This module provides the
device-side stages that, together with the tiled blocking kernel
(ops/tiled_blocking.py), keep the whole two-site step on the accelerator:

  blocking (tiled_blocking)  : env pool  -> env pool          [device]
  mix (this module)          : env pool  -> LW/RW slab pools  [device]
  matvec/diag (this module)  : LW/RW     -> sigma / diag      [device]
  davidson (device_davidson) : jitted lax.while_loop          [device]

Only the center wavefunction (a few MB) and scalars cross the link.

LW/RW layout: StackedMeta over the center-bond MPO symbols — groups by
center delta quantum dq_m, sectors keyed by the fused bra quantum qLb with
dims (DLb, DLk); slab for (group, qLb) holds the group's symbols
contiguously, row-major.  This is the same layout family as the
environment pools, so the mix stage is a pure gather-scale-scatter and the
matvec gathers L/R tiles with strided _gtile reads (no host tile packing,
no per-site pool uploads).

Reference analog: the DelayedOperatorTensor contraction
(src/core/operator_tensor.hpp:209) + EffectiveHamiltonian::operator()
(src/dmrg/effective_hamiltonian.hpp:449) + tensor_product_diagonal.
All task arrays are int32 (pools < 2^31 elements) and every launch is
bounded; jit signatures depend only on (T, capacity classes, scan depth).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, List, Optional, Tuple

import numpy as np

from .csr import w_nonzero as _w_nonzero

from . import jit_cache  # noqa: F401
import jax
import jax.numpy as jnp
from jax import lax

from ..core.symmetry import QN
from .stacked import StackedMeta, _cap_class, _pow2
from .tiled import pick_tile, _TILE_CFG
from .tilev2 import MatvecV2

# scan depth per mix launch (groups of B tasks per jit call).  The warm
# engines are LAUNCH-BOUND on the tunnel (~0.1-0.4 s dispatch/launch, see
# STATUS round 5): B2TPU_MIX_SCAN trades launches for per-launch work.
# Watchdog bound: one scan step is ~B*T*T masked-gather lanes (~0.5 ms
# warm), so even 64-deep launches stay far under the ~60 s kill window.
_MIX_SCAN = max(1, int(os.environ.get("B2TPU_MIX_SCAN", "8")))
_MIX_B = 4096


def _gtile_i32(pool, base, stride, rmax, cmax, T):
    """[B, T, T] tiles from a flat pool at (base + r*stride + c), masked
    to the sentinel (last) slot outside (rmax, cmax) or when base < 0."""
    r = jnp.arange(T, dtype=jnp.int32)[None, :, None]
    c = jnp.arange(T, dtype=jnp.int32)[None, None, :]
    idx = base[:, None, None] + r * stride[:, None, None] + c
    ok = (r < rmax[:, None, None]) & (c < cmax[:, None, None]) \
        & (base[:, None, None] >= 0)
    return pool[jnp.where(ok, idx, pool.shape[0] - 1)]


@partial(jax.jit, static_argnames=("T", "ncap", "nscan"), donate_argnums=0)
def _mix_exec(out, epool, s, coef, T, ncap, nscan):
    """out[obase + r*orstr + c*ocstr] += coef * epool[ebase + r*estr + c]
    for every task; s [nscan, 7, B] int32 rows: ebase, estr, ermax, ecmax,
    obase, orstr, ocstr.  obase < 0 rows are dropped."""
    r = jnp.arange(T, dtype=jnp.int32)[None, :, None]
    c = jnp.arange(T, dtype=jnp.int32)[None, None, :]

    def body(out, g):
        sg, cf = g
        E = _gtile_i32(epool, sg[0], sg[1], sg[2], sg[3], T)
        vals = E * cf[:, None, None]
        idx = sg[4][:, None, None] + r * sg[5][:, None, None] \
            + c * sg[6][:, None, None]
        ok = (r < sg[2][:, None, None]) & (c < sg[3][:, None, None]) \
            & (sg[4][:, None, None] >= 0)
        # value-mask: slot ncap doubles as the zero sentinel that later
        # _gtile reads rely on — it must never accumulate junk, even when
        # the input pool's own sentinel slot is nonzero
        vals = jnp.where(ok, vals, 0)
        return out.at[jnp.where(ok, idx, ncap)].add(vals, mode="drop"), 0

    out, _ = lax.scan(body, out, (s, coef))
    return out


class MixPlan:
    __slots__ = ("meta_out", "T", "ncap_out", "s", "coef", "n_launch",
                 "dims_hint")


def build_mix_plan(meta_env: StackedMeta, entries, quanta,
                   fused, bond_is_first: bool, join_on_input: bool,
                   group, out_bond_dqs, comp_target=None,
                   active=None, fused_ket=None, comp_target_ket=None,
                   active_ket=None, T: Optional[int] = None
                   ) -> Optional[MixPlan]:
    """Plan the LW (join_on_input) or RW assembly from a stacked env pool.

    Mirrors ops.blocking.assemble_fused_ops (reference
    src/core/operator_tensor.hpp:209 DelayedOperatorTensor) but emits
    device gather/scatter tile tasks instead of host scatter plans.
    """
    g = group
    nphys = len(quanta)
    fused_k = fused if fused_ket is None else fused_ket
    ct_k = comp_target if comp_target_ket is None else comp_target_ket
    act_k = active if active_ket is None else active_ket

    # (bond sector code, phys) -> (fused q, sub offset, stride)
    def build_tab(fb, ct, act):
        tab: Dict[Tuple[QN, int], Tuple[QN, int, int]] = {}
        for fq, runs in fb.maps.items():
            if act is not None and fq not in act:
                continue
            for (qa, qb2, off, da, db) in runs:
                if bond_is_first:
                    qbond, p_qn = qa, qb2
                else:
                    p_qn, qbond = qa, qb2
                qb_real = qbond if ct is None else g.sub(ct, qbond)
                idx_within = 0
                for p, q in enumerate(quanta):
                    if q == p_qn:
                        if bond_is_first:
                            tab[(qb_real, p)] = (fq, off + idx_within, db)
                        else:
                            tab[(qb_real, p)] = (fq, off + idx_within * db,
                                                 1)
                        idx_within += 1
        return tab

    tab_b = build_tab(fused, comp_target, active)
    tab_k = build_tab(fused_k, ct_k, act_k)

    # entries keyed by joined symbol
    ent_by: Dict[int, List[Tuple[int, int, int, float]]] = {}
    iscpx = False
    for (i, o), w in sorted(entries.items()):
        jsym = i if join_on_input else o
        osym = o if join_on_input else i
        if np.iscomplexobj(w):
            iscpx = True
        for pb, pk in zip(*_w_nonzero(w)):
            ent_by.setdefault(jsym, []).append(
                (osym, int(pb), int(pk), w[pb, pk]))
    if not ent_by:
        return None

    # discover output sectors, collect contributions
    out_sym_sectors: Dict[int, Dict[QN, Tuple[int, int]]] = {}
    contribs = []  # (ebase, dk(estride), db, dk, osym, qLb, ob, sb, ok, sk, cf)
    dims = []
    for gi, (dq_g, syms) in enumerate(meta_env.groups):
        sec = meta_env.sectors[gi]
        for j, s in enumerate(syms):
            ents = ent_by.get(int(s))
            if ents is None:
                continue
            for qlb, (eoff, db, dk) in sec.items():
                qlk = g.sub(qlb, dq_g)
                ebase = eoff + j * db * dk
                for (osym, pb, pk, cf) in ents:
                    vb = tab_b.get((qlb, pb))
                    vk = tab_k.get((qlk, pk))
                    if vb is None or vk is None:
                        continue
                    qLb, ob, sb = vb
                    qLk, ok, sk = vk
                    d = out_sym_sectors.setdefault(osym, {})
                    if qLb not in d:
                        d[qLb] = (fused.info[qLb], fused_k.info[qLk])
                    contribs.append((ebase, db, dk, osym, qLb, ob, sb,
                                     ok, sk, cf))
                    dims += [db, dk]
    if not contribs:
        return None
    meta_out = StackedMeta.from_bond(out_bond_dqs, out_sym_sectors)
    if T is None:
        T = pick_tile(np.asarray(dims))

    nc = len(contribs)
    ebase_a = np.fromiter((c[0] for c in contribs), np.int64, nc)
    db_a = np.fromiter((c[1] for c in contribs), np.int64, nc)
    dk_a = np.fromiter((c[2] for c in contribs), np.int64, nc)
    ob_a = np.fromiter((c[5] for c in contribs), np.int64, nc)
    sb_a = np.fromiter((c[6] for c in contribs), np.int64, nc)
    ok_a = np.fromiter((c[7] for c in contribs), np.int64, nc)
    sk_a = np.fromiter((c[8] for c in contribs), np.int64, nc)
    cf_a = np.fromiter((c[9] for c in contribs),
                       np.complex128 if iscpx else np.float64, nc)
    # output slab base: ooff + jo*DLb*DLk + ob*DLk + ok (row stride DLk)
    obase_a = np.empty(nc, dtype=np.int64)
    dlk_a = np.empty(nc, dtype=np.int64)
    for idx, c in enumerate(contribs):
        osym, qLb = c[3], c[4]
        go, jo = meta_out.sym_pos[osym]
        ooff, DLb, DLk = meta_out.sectors[go][qLb]
        obase_a[idx] = ooff + jo * DLb * DLk + ob_a[idx] * DLk + ok_a[idx]
        dlk_a[idx] = DLk

    # tile expansion: (ri, ci) grid over (db, dk)
    nr = -(-db_a // T)
    ncc = -(-dk_a // T)
    per = nr * ncc
    tot = int(per.sum())
    it = np.repeat(np.arange(nc), per)
    cum = np.concatenate([[0], np.cumsum(per)[:-1]])
    o = np.arange(tot) - np.repeat(cum, per)
    ncc_i = ncc[it]
    ri = o // ncc_i
    ci = o % ncc_i
    t_eb = ebase_a[it] + ri * T * dk_a[it] + ci * T
    t_es = dk_a[it]
    t_rm = db_a[it] - ri * T
    t_cm = dk_a[it] - ci * T
    t_ors = sb_a[it] * dlk_a[it]
    t_ocs = sk_a[it]
    t_ob = obase_a[it] + ri * T * t_ors + ci * T * t_ocs
    t_cf = cf_a[it]

    if os.environ.get("B2TPU_MIX_STATS"):
        exact = int((db_a * dk_a).sum())
        win = np.unique(np.stack([obase_a, db_a, dk_a]), axis=1)
        wel = int((win[1] * win[2]).sum())
        print(f"      [mixstats] nc={nc} tot_tiles={tot} "
              f"pad_elems={tot * T * T} exact_elems={exact} "
              f"nwin={win.shape[1]} win_elems={wel} "
              f"jred={exact / max(wel, 1):.2f} ncap={_cap_class(meta_out.total + 1)}",
              flush=True)
    # sort by output base for scatter locality
    order = np.argsort(t_ob, kind="stable")
    B = _MIX_B
    n_launch = -(-max(tot, 1) // (B * _MIX_SCAN))
    cap = n_launch * B * _MIX_SCAN
    s_arr = np.zeros((7, cap), dtype=np.int32)
    s_arr[4, :] = -1
    cf_arr = np.zeros(cap, dtype=np.complex128 if iscpx else np.float64)
    s_arr[0, :tot] = t_eb[order]
    s_arr[1, :tot] = t_es[order]
    s_arr[2, :tot] = t_rm[order]
    s_arr[3, :tot] = t_cm[order]
    s_arr[4, :tot] = t_ob[order]
    s_arr[5, :tot] = t_ors[order]
    s_arr[6, :tot] = t_ocs[order]
    cf_arr[:tot] = t_cf[order]

    plan = MixPlan()
    plan.meta_out = meta_out
    plan.T = T
    plan.ncap_out = _cap_class(meta_out.total + 1)
    plan.s = s_arr.reshape(7, n_launch, _MIX_SCAN, B).transpose(1, 2, 0, 3)
    plan.coef = cf_arr.reshape(n_launch, _MIX_SCAN, B)
    plan.n_launch = n_launch
    plan.dims_hint = dims
    return plan


def execute_mix(plan: MixPlan, epool_dev, dtype=np.float32):
    """Run the mix plan; returns the LW/RW slab pool on device [ncap+1]
    (sentinel zero slot at index ncap)."""
    out = jnp.zeros(plan.ncap_out + 1, dtype=dtype)
    cf = plan.coef
    if not np.iscomplexobj(np.zeros(1, dtype)):
        cf = cf.real
    for li in range(plan.n_launch):
        out = _mix_exec(out, epool_dev, jnp.asarray(plan.s[li]),
                        jnp.asarray(cf[li].astype(dtype)),
                        plan.T, plan.ncap_out, _MIX_SCAN)
    return out


# ---------------------------------------------------------------------------
# slab matvec: sigma[ok] += LW[m][lk] @ psi[pk] @ RW[m][rk]^T with L/R tiles
# gathered from row-major slab pools
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("nt1", "nt2", "T"))
def _slab_matvec_impl(xp, lpool, rpool, psi_idx, sig_idx,
                      l4, pa, s1, ta, r4, s2, nt1, nt2, T):
    """l4 [G, 4, B1] int32: lbase, lstride, lrmax, lcmax; r4 likewise.
    pa/ta tile-pool ids (psi / tmp); s1/s2 sorted segment ids."""
    pp = xp[psi_idx]
    hi = lax.Precision.HIGHEST

    def body(sig, g):
        l4G, paG, s1G, taG, r4G, s2G = g
        L = _gtile_i32(lpool, l4G[0], l4G[1], l4G[2], l4G[3], T)
        prod1 = jnp.einsum("bak,bkn->ban", L, pp[paG], precision=hi,
                           preferred_element_type=xp.dtype)
        tmp = jax.ops.segment_sum(prod1, s1G, num_segments=nt1 + 1,
                                  indices_are_sorted=True)
        R = _gtile_i32(rpool, r4G[0], r4G[1], r4G[2], r4G[3], T)
        prod2 = jnp.einsum("ban,bpn->bap", tmp[taG], R, precision=hi,
                           preferred_element_type=xp.dtype)
        sig = sig + jax.ops.segment_sum(prod2, s2G,
                                        num_segments=nt2 + 1,
                                        indices_are_sorted=True)
        return sig, 0

    sig0 = jnp.zeros((nt2 + 1, T, T), dtype=xp.dtype)
    sig, _ = lax.scan(body, sig0, (l4, pa, s1, ta, r4, s2))
    return sig.reshape(-1)[sig_idx]


@partial(jax.jit, static_argnames=("nt2", "T"))
def _slab_diag_impl(lpool, rpool, a4, b4, sD, sig_idx, nt2, T):
    """diag tiles: per task, A = DL tiles [m, a], Bt = DR tiles [m, b],
    prod[a, b] = sum_m A[m, a] * Bt[m, b]; segment-sum over target diag
    tile id (sorted), then flatten through sig_idx."""
    hi = lax.Precision.HIGHEST
    A = _gtile_i32(lpool, a4[0], a4[1], a4[2], a4[3], T)
    Bt = _gtile_i32(rpool, b4[0], b4[1], b4[2], b4[3], T)
    prod = jnp.einsum("tma,tmb->tab", A, Bt, precision=hi,
                      preferred_element_type=lpool.dtype)
    dtl = jax.ops.segment_sum(prod, sD, num_segments=nt2 + 1,
                              indices_are_sorted=True)
    return dtl.reshape(-1)[sig_idx]


@partial(jax.jit, static_argnames=("cap", "T"))
def _dl_build(pool, g4, cap, T):
    """Build a DL/DR pool: strided diagonal rows gathered from a slab
    pool (g4 rows: base, stride, imax, outoff) and written contiguously;
    out[outoff + i] = pool[base + i*stride] for i < imax."""
    i = jnp.arange(T, dtype=jnp.int32)[None, :]
    idx = g4[0][:, None] + i * g4[1][:, None]
    ok = (i < g4[2][:, None]) & (g4[0][:, None] >= 0)
    rows = pool[jnp.where(ok, idx, pool.shape[0] - 1)]
    rows = jnp.where(ok, rows, 0)
    out = jnp.zeros(cap, dtype=pool.dtype)
    oidx = g4[3][:, None] + i
    oidx = jnp.where(g4[0][:, None] >= 0, oidx, cap - 1)
    return out.at[oidx].set(rows, mode="drop")


class SlabMatvec:
    """Compile-once sigma-vector executor reading LW/RW directly from
    device slab pools (the StackedMeta layout produced by execute_mix).

    The task structure depends only on (meta_lw, meta_rw, psi space) and
    is cached across sweeps via cache/cache_key.  Nothing is packed or
    transferred per step except the task arrays themselves (int32).
    """

    def __init__(self, space, meta_lw: StackedMeta, meta_rw: StackedMeta,
                 group, target_b, target_k, dtype=np.float32,
                 T: Optional[int] = None, cache: dict = None,
                 cache_key=None, bra_space=None):
        self.dtype = dtype
        self.space = space
        self.bra_space = bra_space if bra_space is not None else space
        self.size = space.size
        sig = None
        struct = None
        if cache is not None and cache_key is not None:
            sig = hash((meta_lw.signature(), meta_rw.signature(),
                        tuple(space.keys),
                        tuple(sorted(space.shapes.items())),
                        tuple(self.bra_space.keys), T))
            ent = cache.get(cache_key)
            if ent is not None and ent[0] == sig:
                struct = ent[1]
        if struct is None:
            struct = self._build(space, self.bra_space, meta_lw, meta_rw,
                                 group, target_b, target_k, T)
            if cache is not None and cache_key is not None:
                cache[cache_key] = (sig, struct)
        self.struct = struct
        self._dev = None

    # ------------------------------------------------------------------
    @staticmethod
    def _build(space, bra_space, meta_lw, meta_rw, g, tb, tk, T):
        # map center symbol -> (lw slab position, rw slab position, dq)
        lw_dq = {}
        for gi, (dq, syms) in enumerate(meta_lw.groups):
            for s in syms:
                lw_dq[int(s)] = dq
        # triples: for m, psi key (qLk, qRk): qLb = qLk + dq_m; out key
        # (qLb, tb - qLb); need lw sector qLb and rw sector qRb.
        dims = []
        for k in space.keys:
            dims += list(space.shapes[k])
        for k in bra_space.keys:
            dims += list(bra_space.shapes[k])
        trip = []   # (lbase, lstr, DLb, DLk, rbase, rstr, DRb, DRk, pk, ok)
        bkeys = set(bra_space.keys)
        for m, (gl, jl) in meta_lw.sym_pos.items():
            gr_jr = meta_rw.sym_pos.get(m)
            if gr_jr is None:
                continue
            gr, jr = gr_jr
            dq = lw_dq[m]
            sec_l = meta_lw.sectors[gl]
            sec_r = meta_rw.sectors[gr]
            for (qLk, qRk) in space.keys:
                qLb = g.add(qLk, dq)
                qRb = g.sub(tb, qLb)
                if (qLb, qRb) not in bkeys:
                    continue
                el = sec_l.get(qLb)
                er = sec_r.get(qRb)
                if el is None or er is None:
                    continue
                loff, DLb, DLk = el
                roff, DRb, DRk = er
                if DLk != space.shapes[(qLk, qRk)][0] or \
                        DRk != space.shapes[(qLk, qRk)][1]:
                    continue
                trip.append((loff + jl * DLb * DLk, DLk, DLb,
                             roff + jr * DRb * DRk, DRk, DRb,
                             (qLk, qRk), (qLb, qRb)))
        if T is None:
            T = pick_tile(np.asarray(dims if dims else [16]))
        B, nt1 = _TILE_CFG[T]

        # tiled layout of flat psi (ket space) and sigma (bra space)
        def vec_layout(sp):
            vb = {}
            nv = 0
            for k in sp.keys:
                r, c = sp.shapes[k]
                nr, ncc = -(-r // T), -(-c // T)
                vb[k] = (nv, nr, ncc)
                nv += nr * ncc
            return vb, nv

        vbk, nvk = vec_layout(space)
        vbb, nvb = vec_layout(bra_space)
        nt2 = _pow2(nvb + 1)
        size_p = _pow2(space.size + 1)
        sizb_p = _pow2(bra_space.size + 1)

        psi_idx = np.full((_pow2(nvk + 1), T, T), size_p, dtype=np.int32)
        for k in space.keys:
            off = space.offsets[k]
            r, c = space.shapes[k]
            base, nr, ncc = vbk[k]
            fr, fc = np.divmod(np.arange(r * c), c)
            tidx = ((base + (fr // T) * ncc + (fc // T)) * (T * T)
                    + (fr % T) * T + (fc % T))
            psi_idx.reshape(-1)[tidx] = off + np.arange(r * c)
        sig_idx = np.full(sizb_p, (nt2 + 1) * T * T - 1, dtype=np.int32)
        for k in bra_space.keys:
            off = bra_space.offsets[k]
            r, c = bra_space.shapes[k]
            base, nr, ncc = vbb[k]
            fr, fc = np.divmod(np.arange(r * c), c)
            tidx = ((base + (fr // T) * ncc + (fc // T)) * (T * T)
                    + (fr % T) * T + (fc % T))
            sig_idx[off + np.arange(r * c)] = tidx

        ntr = len(trip)
        if ntr == 0:
            raise ValueError("no matvec triples")
        lbase_a = np.fromiter((x[0] for x in trip), np.int64, ntr)
        DLk_a = np.fromiter((x[1] for x in trip), np.int64, ntr)
        DLb_a = np.fromiter((x[2] for x in trip), np.int64, ntr)
        rbase_a = np.fromiter((x[3] for x in trip), np.int64, ntr)
        DRk_a = np.fromiter((x[4] for x in trip), np.int64, ntr)
        DRb_a = np.fromiter((x[5] for x in trip), np.int64, ntr)
        pb_a = np.fromiter((vbk[x[6]][0] for x in trip), np.int64, ntr)
        ob_a = np.fromiter((vbb[x[7]][0] for x in trip), np.int64, ntr)
        # tile grids: a over DLb, k over DLk, p over DRb, n over DRk
        na_a = -(-DLb_a // T)
        nk_a = -(-DLk_a // T)
        np_a = -(-DRb_a // T)
        nn_a = -(-DRk_a // T)
        itmp = na_a * nn_a
        is1 = itmp * nk_a
        is2 = itmp * np_a
        if (itmp.max() > nt1 or is1.max() > B or is2.max() > B):
            raise ValueError(f"block too large for tile cfg T={T}")
        grp = np.empty(ntr, dtype=np.int64)
        tb_a = np.empty(ntr, dtype=np.int64)
        o1_a = np.empty(ntr, dtype=np.int64)
        o2_a = np.empty(ntr, dtype=np.int64)
        gidx = t_used = u1 = u2 = 0
        for i in range(ntr):
            if (t_used + itmp[i] > nt1 or u1 + is1[i] > B
                    or u2 + is2[i] > B):
                gidx += 1
                t_used = u1 = u2 = 0
            grp[i] = gidx
            tb_a[i] = t_used
            o1_a[i] = u1
            o2_a[i] = u2
            t_used += itmp[i]
            u1 += is1[i]
            u2 += is2[i]
        ng = gidx + 1
        G = _pow2(ng)
        l4 = np.zeros((G, 4, B), dtype=np.int32)
        l4[:, 0, :] = -1
        pa = np.full((G, B), _pow2(nvk + 1), dtype=np.int32)
        s1 = np.full((G, B), nt1, dtype=np.int32)
        ta = np.full((G, B), nt1, dtype=np.int32)
        r4 = np.zeros((G, 4, B), dtype=np.int32)
        r4[:, 0, :] = -1
        s2 = np.full((G, B), nt2, dtype=np.int32)
        # stage 1 tasks (ai, ni, ki)
        tot1 = int(is1.sum())
        item1 = np.repeat(np.arange(ntr), is1)
        cum1 = np.concatenate([[0], np.cumsum(is1)[:-1]])
        o = np.arange(tot1) - np.repeat(cum1, is1)
        nk1 = nk_a[item1]
        nn1 = nn_a[item1]
        ai = o // (nn1 * nk1)
        ni = (o // nk1) % nn1
        ki = o % nk1
        pos = np.repeat(o1_a, is1) + o
        gi = grp[item1]
        l4[gi, 0, pos] = lbase_a[item1] + ai * T * DLk_a[item1] + ki * T
        l4[gi, 1, pos] = DLk_a[item1]
        l4[gi, 2, pos] = DLb_a[item1] - ai * T
        l4[gi, 3, pos] = DLk_a[item1] - ki * T
        pa[gi, pos] = pb_a[item1] + ki * nn1 + ni
        s1[gi, pos] = np.repeat(tb_a, is1) + ai * nn1 + ni
        # stage 2 tasks (ai, ni, pi), sorted per group by target tile
        tot2 = int(is2.sum())
        item2 = np.repeat(np.arange(ntr), is2)
        cum2 = np.concatenate([[0], np.cumsum(is2)[:-1]])
        o = np.arange(tot2) - np.repeat(cum2, is2)
        nn2 = nn_a[item2]
        npp = np_a[item2]
        ai = o // (nn2 * npp)
        ni = (o // npp) % nn2
        pi = o % npp
        v_s2 = ob_a[item2] + ai * npp + pi
        v_ta = np.repeat(tb_a, is2) + ai * nn2 + ni
        v_rb = rbase_a[item2] + pi * T * DRk_a[item2] + ni * T
        gi2 = grp[item2]
        order = np.lexsort((v_rb, v_ta, v_s2, gi2))
        gsz = np.bincount(gi2, minlength=ng)
        gstart = np.concatenate([[0], np.cumsum(gsz)[:-1]])
        pos2 = np.arange(tot2) - np.repeat(gstart, gsz)
        go = gi2[order]
        s2[go, pos2] = v_s2[order]
        ta[go, pos2] = v_ta[order]
        r4[go, 0, pos2] = v_rb[order]
        r4[go, 1, pos2] = DRk_a[item2][order]
        r4[go, 2, pos2] = (DRb_a[item2] - pi * T)[order]
        r4[go, 3, pos2] = (DRk_a[item2] - ni * T)[order]

        return {"T": T, "nt1": nt1, "nt2": nt2, "size_p": size_p,
                "sizb_p": sizb_p,
                "psi_idx": psi_idx, "sig_idx": sig_idx,
                "l4": l4, "pa": pa, "s1": s1, "ta": ta, "r4": r4,
                "s2": s2}

    # ------------------------------------------------------------------
    def to_device(self):
        if self._dev is None:
            s = self.struct
            self._dev = {k: jnp.asarray(s[k])
                         for k in ("psi_idx", "sig_idx", "l4", "pa", "s1",
                                   "ta", "r4", "s2")}
        return self._dev

    def pad(self, x: np.ndarray) -> np.ndarray:
        xp = np.zeros(self.struct["size_p"] + 1, dtype=self.dtype)
        xp[:self.size] = x
        return xp

    def matvec_device(self, xp, lpool, rpool):
        s = self.struct
        d = self.to_device()
        return _slab_matvec_impl(xp, lpool, rpool, d["psi_idx"],
                                 d["sig_idx"], d["l4"], d["pa"], d["s1"],
                                 d["ta"], d["r4"], d["s2"],
                                 s["nt1"], s["nt2"], s["T"])

    def free(self):
        if self._dev is not None:
            for a in self._dev.values():
                try:
                    a.delete()
                except Exception:
                    pass
            self._dev = None


def build_diag_struct(space, meta_lw: StackedMeta, meta_rw: StackedMeta,
                      T: int, nt2: int, sig_idx: np.ndarray):
    """Diag tasks: only center symbols with dq = 0 contribute
    (LW[m][(qL,qL)] x RW[m][(qR,qR)] diagonals).  Emits (1) strided
    diag-gather tasks building DL/DR row-major [M0p, Dpad] per sector and
    (2) GEMM tile tasks contracting over m.  Returns a struct executable
    by execute_diag."""
    g0l = g0r = None
    zero = None
    for gi, (dq, syms) in enumerate(meta_lw.groups):
        if all(x == 0 for x in dq):
            g0l = gi
            zero = dq
            break
    for gi, (dq, syms) in enumerate(meta_rw.groups):
        if all(x == 0 for x in dq):
            g0r = gi
            break
    if g0l is None or g0r is None:
        return None
    dql, syml = meta_lw.groups[g0l]
    dqr, symr = meta_rw.groups[g0r]
    # common symbols, positions in each slab
    posl = {int(s): j for j, s in enumerate(syml)}
    posr = {int(s): j for j, s in enumerate(symr)}
    common = sorted(set(posl) & set(posr))
    if not common:
        return None
    M0 = len(common)
    M0p = -(-M0 // T) * T

    # DL/DR pool layout: per psi sector (qL, qR): [M0p rows x DLpad cols]
    gtasks_l = []   # (base, stride, imax, outrow)
    gtasks_r = []
    gemm = []       # (abase, astr, armax, acmax, bbase, ..., out tile)
    dl_off = dr_off = 0
    dl_secoff = {}
    dr_secoff = {}
    for (qL, qR) in space.keys:
        el = meta_lw.sectors[g0l].get(qL)
        er = meta_rw.sectors[g0r].get(qR)
        DL, DR = space.shapes[(qL, qR)]
        if el is None or er is None:
            continue
        loff, DLb, DLk = el
        roff, DRb, DRk = er
        if DLb != DL or DLk != DL or DRb != DR or DRk != DR:
            continue
        DLpad = -(-DL // T) * T
        DRpad = -(-DR // T) * T
        dl_secoff[(qL, qR)] = (dl_off, DLpad)
        dr_secoff[(qL, qR)] = (dr_off, DRpad)
        for mi, m in enumerate(common):
            jl, jr = posl[m], posr[m]
            for tile in range(DLpad // T):
                gtasks_l.append((loff + jl * DL * DL + tile * T * (DL + 1),
                                 DL + 1, DL - tile * T,
                                 dl_off + mi * DLpad + tile * T))
            for tile in range(DRpad // T):
                gtasks_r.append((roff + jr * DR * DR + tile * T * (DR + 1),
                                 DR + 1, DR - tile * T,
                                 dr_off + mi * DRpad + tile * T))
        dl_off += M0p * DLpad
        dr_off += M0p * DRpad
    if not gtasks_l:
        return None

    # GEMM tile tasks: diag_sec[a, b] = sum_m DL[m, a] * DR[m, b]
    vbb = {}
    nv = 0
    for k in space.keys:
        r, c = space.shapes[k]
        vbb[k] = (nv, -(-r // T), -(-c // T))
        nv += (-(-r // T)) * (-(-c // T))
    a4t, b4t, sDt = [], [], []
    for (qL, qR) in space.keys:
        if (qL, qR) not in dl_secoff:
            continue
        doff, DLpad = dl_secoff[(qL, qR)]
        roff2, DRpad = dr_secoff[(qL, qR)]
        DL, DR = space.shapes[(qL, qR)]
        base, nr, ncc = vbb[(qL, qR)]
        for ai in range(nr):
            for bi in range(ncc):
                for mi in range(M0p // T):
                    a4t.append((doff + mi * T * DLpad + ai * T, DLpad,
                                M0 - mi * T, DL - ai * T))
                    b4t.append((roff2 + mi * T * DRpad + bi * T, DRpad,
                                M0 - mi * T, DR - bi * T))
                    sDt.append(base + ai * ncc + bi)
    order = np.argsort(np.asarray(sDt), kind="stable")
    nB = _pow2(len(a4t))
    a4 = np.zeros((4, nB), dtype=np.int32)
    a4[0, :] = -1
    b4 = np.zeros((4, nB), dtype=np.int32)
    b4[0, :] = -1
    sD = np.full(nB, nt2, dtype=np.int32)
    a4[:, :len(a4t)] = np.asarray(a4t, dtype=np.int32)[order].T
    b4[:, :len(b4t)] = np.asarray(b4t, dtype=np.int32)[order].T
    sD[:len(sDt)] = np.asarray(sDt, dtype=np.int32)[order]

    def exp_g(tasks, total):
        """Expand strided-row gather tasks to int32 arrays + out dims."""
        t = np.asarray(tasks, dtype=np.int64)
        nBg = _pow2(len(t))
        arr = np.zeros((4, nBg), dtype=np.int32)
        arr[0, :] = -1
        arr[0, :len(t)] = t[:, 0]
        arr[1, :len(t)] = t[:, 1]
        arr[2, :len(t)] = t[:, 2]
        arr[3, :len(t)] = t[:, 3]
        return arr, _pow2(total + 1)

    gl, dl_cap = exp_g(gtasks_l, dl_off)
    gr, dr_cap = exp_g(gtasks_r, dr_off)
    return {"gl": gl, "gr": gr, "dl_cap": dl_cap, "dr_cap": dr_cap,
            "a4": a4, "b4": b4, "sD": sD, "T": T, "nt2": nt2,
            "sig_idx": sig_idx}


@partial(jax.jit, static_argnames=("max_subspace",))
def _dav_init(x0, max_subspace):
    from .device_davidson import davidson_state_init
    return davidson_state_init(x0, max_subspace)


@jax.jit
def _dav_final(state):
    from .device_davidson import davidson_finalize
    return davidson_finalize(state)


@partial(jax.jit, static_argnames=("nt1", "nt2", "T", "B", "it_cap",
                                   "max_iter"))
def _v2_dav_chunk(state, diag, ltile, rtile, l_tid, r_tid, psi_idx,
                  sig_idx, it, cum1, cum2, g1, g2, ng, conv_thrd, nt1,
                  nt2, T, B, it_cap, max_iter):
    """ng (live group count) and conv_thrd are traced operands: neither
    per-site group counts nor per-sweep Davidson thresholds may mint a
    new jit signature (each costs a fresh ~1-4 min remote compile)."""
    from .device_davidson import davidson_chunk
    from .tilev2 import _mv_exec

    def mv(v):
        out = _mv_exec(v, ltile, rtile, l_tid, r_tid, psi_idx, sig_idx,
                       it, cum1, cum2, g1, g2, ng, nt1, nt2, T, B)
        return jnp.concatenate([out, jnp.zeros(1, dtype=out.dtype)])

    return davidson_chunk(mv, diag, state, conv_thrd=conv_thrd,
                          it_cap=it_cap, max_iter=max_iter)


def _dav_chunk_cap():
    import os
    # 32 iterations per launch: chunk dispatch costs ~0.1-0.3 s on the
    # tunnel, so fewer/longer chunks win once single launches stay well
    # under the worker watchdog — measured warm 32-iteration chunks are
    # 2.6-5.3 s on the Cr2 D=250 deck (RESULTS/launch_chunk.json), so a
    # full 30-iteration solve is 1-2 launches
    return max(1, int(os.environ.get("B2TPU_DAV_CHUNK", "32")))


def _v2_dav(x0, diag, ltile, rtile, l_tid, r_tid, psi_idx, sig_idx, it,
            cum1, cum2, g1, g2, ng, conv_thrd, nt1, nt2, T, B, max_iter,
            max_subspace):
    """On-device Davidson around the v2 slab matvec, chained from the
    host in bounded launches of B2TPU_DAV_CHUNK (default 4) iterations.

    A single-launch while_loop over the whole solve ran for minutes on
    hard sites and was killed by the target system's worker watchdog
    (reproducible worker crash past ~60 s launches on the Cr2 deck);
    tunnel dispatch latency also varies wildly, so bounded launches with
    the subspace state held on device are both safer and no slower —
    only the (rn2, it) scalars cross the link between chunks."""
    state = _dav_init(x0, max_subspace)
    cap = _dav_chunk_cap()
    ngj = jnp.asarray(ng, jnp.int32)
    ct = jnp.asarray(conv_thrd, x0.dtype)
    import os as _os
    import time as _time
    chunk_t = [] if _os.environ.get("B2TPU_SITE_TIMERS") else None
    while True:
        _tc = _time.time()
        state = _v2_dav_chunk(state, diag, ltile, rtile, l_tid, r_tid,
                              psi_idx, sig_idx, it, cum1, cum2, g1, g2,
                              ngj, ct, nt1, nt2, T, B, cap, max_iter)
        itc = int(state[5])
        rn2 = float(state[4])
        if chunk_t is not None:
            chunk_t.append(_time.time() - _tc)
        if itc >= max_iter or (rn2 <= conv_thrd and itc >= 1):
            break
    if chunk_t:
        print("      [dav] chunks(s): "
              + " ".join(f"{x:.2f}" for x in chunk_t), flush=True)
    return _dav_final(state)


@partial(jax.jit, static_argnames=("nt1", "nt2", "T", "B", "it_cap",
                                   "max_iter", "mesh", "axis"))
def _v2_dav_sharded_chunk(state, diag, ltile, rtile, l_tid, r_tid,
                          psi_idx, sig_idx, it, cum1, cum2, g1, g2, e1,
                          e2, ng, conv_thrd, nt1, nt2, T, B, it_cap,
                          max_iter, mesh, axis):
    """g1/g2/e1/e2 are round-robin interleaved per-device group arrays
    (tilev2.shard_groups) and ng the per-device live trip count; ng and
    conv_thrd are traced so group counts / thresholds never mint a new
    jit signature."""
    from jax.sharding import PartitionSpec as P

    from .device_davidson import davidson_chunk
    from .tilev2 import _mv_scan

    def local(g1s, g2s, e1s, e2s, st, dgl, lt, rt, lti, rti, pidx,
              sidx, itl, c1, c2, ngl, ct):
        def mv(v):
            sig = _mv_scan(v, lt, rt, lti, rti, pidx, itl, c1, c2,
                           g1s, g2s, e1s, e2s, ngl, nt1, nt2, T, B,
                           vary_axis=axis)
            sig = jax.lax.psum(sig, axis)
            out = sig.reshape(-1)[sidx]
            return jnp.concatenate([out, jnp.zeros(1, dtype=out.dtype)])

        return davidson_chunk(mv, dgl, st, conv_thrd=ct,
                              it_cap=it_cap, max_iter=max_iter)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis),) * 4 + (P(),) * 13,
        out_specs=(P(),) * 6)
    return fn(g1, g2, e1, e2, state, diag, ltile, rtile, l_tid, r_tid,
              psi_idx, sig_idx, it, cum1, cum2, ng, conv_thrd)


def _v2_dav_sharded(x0, diag, ltile, rtile, l_tid, r_tid, psi_idx,
                    sig_idx, it, cum1, cum2, g1, g2, e1, e2, ngl, nt1,
                    nt2, T, B, conv_thrd, max_iter, max_subspace, mesh,
                    axis="op"):
    """Sharded on-device Davidson: the subspace iteration runs
    replicated on every device (the reference's rank-redundant Davidson,
    src/core/iterative_matrix_functions.hpp:1181 pcomm semantics) while
    every matvec splits the task groups over the mesh axis and psums the
    partial sigma tile pools (parallel_tensor_functions.hpp:219).
    Chained from the host in bounded launches like _v2_dav."""
    state = _dav_init(x0, max_subspace)
    cap = _dav_chunk_cap()
    ct = jnp.asarray(conv_thrd, x0.dtype)
    while True:
        state = _v2_dav_sharded_chunk(
            state, diag, ltile, rtile, l_tid, r_tid, psi_idx, sig_idx,
            it, cum1, cum2, g1, g2, e1, e2, ngl, ct, nt1, nt2, T, B,
            cap, max_iter, mesh, axis)
        itc = int(state[5])
        rn2 = float(state[4])
        if itc >= max_iter or (rn2 <= conv_thrd and itc >= 1):
            break
    return _dav_final(state)


# ---------------------------------------------------------------------------
# device-side perturbative noise: rho_n[qb] += sum_m (W_m psi)(W_m psi)^T
# (reference src/dmrg/effective_hamiltonian.hpp:253 perturbative_noise).
# Stage 1 is the matvec's stage 1 (x tiles = W tiles @ psi tiles); stage 2
# accumulates x x^T tile outer products into a small per-sector rho pool —
# the host alternative downloads the full assembled-operator pool
# (hundreds of MB/site over the slow link) just to form these products.
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("nt1", "nrho", "T", "B"))
def _noise_exec(xp, wtile, w_tid, psi_idx, it, cum1, cum2, g1, g2, e1,
                e2, ng, nt1, nrho, T, B):
    """it [n, 10] int32: wbase, wstride, DB, pb, na, nk, nn, tb, rb, DK.
    Stage-1 tasks (ai, ni, ki): tmp[tb + ai*nn + ni] += Wtile @ psitile.
    Stage-2 tasks (ar, ac, ni): rho[rb + ar*na + ac] +=
    tmp[tb + ar*nn + ni] @ tmp[tb + ac*nn + ni]^T.

    wtile/w_tid: PRE-MATERIALIZED [nwt+1, T, T] slab tile pool + task ->
    tile id map (an in-loop _gtile lowers ~200x slower; see tilev2)."""
    from .tilev2 import _locate
    pp = xp[psi_idx]
    hi = lax.Precision.HIGHEST

    def body(i, rho):
        g1s, g2s, e1s, e2s = g1[i], g2[i], e1[i], e2[i]
        i1, o1, v1 = _locate(cum1, g1s, e1s, B)
        tau1 = jnp.clip(g1s + jnp.arange(B, dtype=jnp.int32), 0,
                        w_tid.shape[0] - 1)
        f = it[i1]
        nn, nk = f[:, 6], f[:, 5]
        ai = o1 // (nn * nk)
        ni = (o1 // nk) % nn
        ki = o1 % nk
        W = wtile[w_tid[tau1]]
        pa = jnp.where(v1, f[:, 3] + ki * nn + ni, pp.shape[0] - 1)
        p1 = jnp.einsum("bak,bkn->ban", W, pp[pa], precision=hi,
                        preferred_element_type=xp.dtype)
        s1 = jnp.where(v1, f[:, 7] + ai * nn + ni, nt1)
        tmp = jax.ops.segment_sum(p1, s1, num_segments=nt1 + 1,
                                  indices_are_sorted=True)
        i2, o2, v2 = _locate(cum2, g2s, e2s, B)
        f = it[i2]
        na, nn2 = f[:, 4], f[:, 6]
        ar = o2 // (na * nn2)
        ac = (o2 // nn2) % na
        ni2 = o2 % nn2
        t1 = jnp.where(v2, f[:, 7] + ar * nn2 + ni2, nt1)
        t2 = jnp.where(v2, f[:, 7] + ac * nn2 + ni2, nt1)
        prod = jnp.einsum("ban,bcn->bac", tmp[t1], tmp[t2],
                          precision=hi, preferred_element_type=xp.dtype)
        s2 = jnp.where(v2, f[:, 8] + ar * na + ac, nrho)
        rho = rho + jax.ops.segment_sum(prod, s2,
                                        num_segments=nrho + 1,
                                        indices_are_sorted=False)
        return rho

    rho0 = jnp.zeros((nrho + 1, T, T), dtype=xp.dtype)
    return lax.fori_loop(0, ng, body, rho0)


class NoisePlan:
    """Per-(site, side) task structure for the device noise kernel.

    side='lw' (forward): x[qLb, qR] = LW[m][(qLb, qLk)] @ psi[(qLk, qR)],
    rho[qLb] += x x^T — tiles read from the LW slab pool + the matvec's
    tiled psi pool (psi_idx reused from the MatvecV2 struct).
    side='rw' (backward): y = x^T = RW[m] @ psi^T — same kernel with the
    RW slab pool and a TRANSPOSED psi tile gather (built here), and
    rho[qRb] += y y^T."""

    __slots__ = ("it", "cum1", "cum2", "g1", "g2", "e1", "e2", "ng_live",
                 "nt1", "nrho", "T", "B", "sectors", "psi_idx", "wtd",
                 "w_tid", "_dev", "_devtok")

    # cross-process persistence (B2TPU_PLAN_CACHE): strip device handles
    def __getstate__(self):
        return {k: getattr(self, k) for k in self.__slots__
                if k not in ("_dev", "_devtok")}

    def __setstate__(self, st):
        for k, v in st.items():
            object.__setattr__(self, k, v)
        object.__setattr__(self, "_dev", None)
        object.__setattr__(self, "_devtok", None)

    def __init__(self, space, meta, group, side, T, psi_idx):
        from .tilev2 import _CFG
        B, nt1 = _CFG[T]
        self.T, self.B, self.nt1 = T, B, nt1
        # psi tile layout bases (must match the psi_idx tile order)
        vbk = {}
        nv = 0
        for k in space.keys:
            r, c = space.shapes[k]
            if side == "rw":
                r, c = c, r
            vbk[k] = nv
            nv += (-(-r // T)) * (-(-c // T))
        if side == "rw" and psi_idx is None:
            # transposed psi tiles: tile grid over [DRk, DLk]
            sp = _pow2(space.size + 1)
            psi_idx = np.full((_pow2(nv + 1), T, T), sp, dtype=np.int32)
            for k in space.keys:
                off = space.offsets[k]
                r, c = space.shapes[k]   # psi block [r, c] row-major
                base = vbk[k]
                ncc = -(-r // T)         # cols of psi^T = r
                # element (i, j) of psi^T = psi[j, i] at off + j*c + i
                fr, fc = np.divmod(np.arange(c * r), r)   # psi^T coords
                tidx = ((base + (fr // T) * ncc + (fc // T)) * (T * T)
                        + (fr % T) * T + (fc % T))
                psi_idx.reshape(-1)[tidx] = off + fc * c + fr
        self.psi_idx = psi_idx

        dq_of = {}
        for gi, (dq, syms) in enumerate(meta.groups):
            for s in syms:
                dq_of[int(s)] = dq
        # rho sectors over the bond quantum qb; tiled [na, na] per sector
        rows = []       # wbase, wstride, DB, pb, na, nk, nn, DK
        rkeys = []      # qb per row
        sec_dims: Dict[QN, int] = {}
        for m, (gm, jm) in sorted(meta.sym_pos.items()):
            dq = dq_of[m]
            sec = meta.sectors[gm]
            for k in space.keys:
                qLk, qRk = k
                if side == "lw":
                    qb = group.add(qLk, dq)
                    ent = sec.get(qb)
                    if ent is None:
                        continue
                    off, DB, DKw = ent
                    DK, DN = space.shapes[k]
                else:
                    # RW meta group dq is the left-cumulative MPO bond
                    # charge: qRk = qRb + dq (see host_ops), so
                    # qRb = qRk - dq
                    qb = group.sub(qRk, dq)
                    ent = sec.get(qb)
                    if ent is None:
                        continue
                    off, DB, DKw = ent
                    DN, DK = space.shapes[k]
                if DKw != DK:
                    continue
                rows.append((off + jm * DB * DKw, DKw, DB, vbk[k], DK,
                             DN))
                rkeys.append(qb)
                d = sec_dims.get(qb)
                if d is None or DB > d:
                    sec_dims[qb] = DB
        if not rows:
            raise ValueError("no noise items")
        # rho tile layout
        roff = {}
        nrho = 0
        for qb in sorted(sec_dims):
            na = -(-sec_dims[qb] // T)
            roff[qb] = (nrho, na, sec_dims[qb])
            nrho += na * na
        self.sectors = roff
        self.nrho = _pow2(nrho + 1) - 1

        n = len(rows)
        itf = np.zeros((max(n, 1), 10), dtype=np.int64)
        for i, ((wb, ws, DB, pb, DK, DN), qb) in enumerate(
                zip(rows, rkeys)):
            na = -(-DB // T)
            nk = -(-DK // T)
            nn = -(-DN // T)
            itf[i] = (wb, ws, DB, pb, na, nk, nn, 0, roff[qb][0] * 1, DK)
        na_a = itf[:, 4]
        nk_a = itf[:, 5]
        nn_a = itf[:, 6]
        itmp = na_a * nn_a
        is1 = itmp * nk_a
        is2 = na_a * na_a * nn_a
        if int(max(is1.max(), is2.max())) > B or int(itmp.max()) > nt1:
            raise ValueError("noise item too large for tile cfg")
        tb = np.empty(n, dtype=np.int64)
        gfirst1, gfirst2 = [0], [0]
        c1 = np.concatenate([[0], np.cumsum(is1)])
        c2 = np.concatenate([[0], np.cumsum(is2)])
        t_used = u1 = u2 = 0
        for i in range(n):
            if (t_used + itmp[i] > nt1 or u1 + is1[i] > B
                    or u2 + is2[i] > B):
                gfirst1.append(int(c1[i]))
                gfirst2.append(int(c2[i]))
                t_used = u1 = u2 = 0
            tb[i] = t_used
            t_used += itmp[i]
            u1 += is1[i]
            u2 += is2[i]
        itf[:, 7] = tb
        # pre-materialized W tile pool: unique tiles per item over the
        # (na x nk) grid; stage-1 tasks map through w_tid
        nw_item = na_a * nk_a
        wt_base = np.concatenate([[0], np.cumsum(nw_item)])
        nwt = int(wt_base[-1])
        cnt = nw_item
        item_t = np.repeat(np.arange(n), cnt)
        o_t = np.arange(nwt) - np.repeat(wt_base[:-1], cnt)
        nk_t = nk_a[item_t]
        ai_t = o_t // nk_t
        ki_t = o_t % nk_t
        wtd = np.empty((4, nwt), np.int32)
        wtd[0] = itf[item_t, 0] + ai_t * T * itf[item_t, 1] + ki_t * T
        wtd[1] = itf[item_t, 1]
        wtd[2] = itf[item_t, 2] - ai_t * T
        wtd[3] = itf[item_t, 1] - ki_t * T
        nwt_p = _pow2(nwt + 1)
        wtd = np.concatenate(
            [wtd, np.tile([[-1], [1], [0], [0]], (1, nwt_p - nwt))], 1)
        tot1 = int(np.cumsum(is1)[-1]) if n else 0
        item1 = np.repeat(np.arange(n), is1)
        o1h = np.arange(tot1) - np.repeat(
            np.concatenate([[0], np.cumsum(is1)])[:-1], is1)
        nn1, nk1 = nn_a[item1], nk_a[item1]
        ai1 = o1h // (nn1 * nk1)
        ki1 = o1h % nk1
        w_tid = np.full(_pow2(tot1 + 1), nwt_p, np.int32)
        w_tid[:tot1] = wt_base[item1] + ai1 * nk1 + ki1
        self.wtd = wtd
        self.w_tid = w_tid
        # rho tile base: row-grid stride is the SECTOR's na (items of the
        # same sector share it; na per item equals the sector grid since
        # DB is sector-wide by construction of the slab meta)
        n_q = _pow2(n)
        it32 = np.zeros((n_q, 10), dtype=np.int32)
        it32[:n] = itf
        it32[n:, 4:7] = 1
        c1 = np.concatenate([c1, np.full(n_q - n, c1[-1], c1.dtype)])
        c2 = np.concatenate([c2, np.full(n_q - n, c2[-1], c2.dtype)])
        self.cum1 = c1.astype(np.int32)
        self.cum2 = c2.astype(np.int32)
        self.ng_live = len(gfirst1)
        gcap = max(64, _pow2(self.ng_live))
        gfirst1 += [int(c1[-1])] * (gcap - len(gfirst1))
        gfirst2 += [int(c2[-1])] * (gcap - len(gfirst2))
        g1 = np.asarray(gfirst1, dtype=np.int32)
        g2 = np.asarray(gfirst2, dtype=np.int32)
        self.g1, self.g2 = g1, g2
        self.e1 = np.concatenate(
            [g1[1:self.ng_live], c1[-1:],
             g1[self.ng_live:]]).astype(np.int32)
        self.e2 = np.concatenate(
            [g2[1:self.ng_live], c2[-1:],
             g2[self.ng_live:]]).astype(np.int32)
        self.it = it32
        self._dev = None
        self._devtok = None

    def rho_device(self, xp, wpool):
        from .tilev2 import _tile_gather
        from . import devcache
        if self._devtok is None:
            object.__setattr__(self, "_devtok", devcache.new_token())
        dev = devcache.get((self._devtok,), lambda: devcache.upload_packed(
            {str(i): a for i, a in enumerate(
                (self.psi_idx, self.it, self.cum1,
                 self.cum2, self.g1, self.g2, self.e1,
                 self.e2, self.wtd, self.w_tid))}))
        pidx, it, c1, c2, g1, g2, e1, e2, wtd, w_tid = (
            dev[str(i)] for i in range(10))
        wt = _tile_gather(wpool, wtd, self.T)
        return _noise_exec(xp, wt, w_tid, pidx, it, c1, c2, g1, g2, e1,
                           e2, jnp.asarray(self.ng_live, jnp.int32),
                           self.nt1, self.nrho, self.T, self.B)

    def unpack(self, rho_tiles: np.ndarray):
        """Tiled device rho pool -> {qb: dense [D, D]} on host."""
        T = self.T
        out = {}
        for qb, (base, na, D) in self.sectors.items():
            blk = rho_tiles[base:base + na * na] \
                .reshape(na, na, T, T).transpose(0, 2, 1, 3) \
                .reshape(na * T, na * T)[:D, :D]
            out[qb] = np.asarray(blk, dtype=np.float64)
        return out


def _mix_sig(meta_env, entries, fused, fused_ket, active, active_ket,
             comp_target, comp_target_ket, out_bond_dqs):
    """Validation signature for a cached MixPlan: env pool layout + every
    non-env input (MPO entry content, fused bases, active sets, targets,
    output bond charges)."""
    from .blocking import _plan_args_sig
    # the trailing 3 is the structural layout version (v3: 12-field
    # split GEMM items + window place tables) — persisted plans from
    # older layouts mismatch and rebuild
    return hash((meta_env.signature(),
                 _plan_args_sig(entries, fused, fused_ket, active,
                                active_ket, comp_target, comp_target_ket),
                 tuple(out_bond_dqs), _mix_ver(), 3))


def _mix_ver() -> int:
    """Active mix engine version (B2TPU_MIX): 4 = packed-upload
    one-launch tiled GEMM (ops/mixv4.py, default), 3 = per-group GEMM
    assembly (ops/mixv3.py), 2 = legacy scatter mix.  Folded into plan
    cache signatures so persisted plans from another engine rebuild."""
    return int(os.environ.get("B2TPU_MIX", "4"))


class ResidentSite:
    """Fully device-resident two-site effective-Hamiltonian step.

    Orchestrates, per center site t:
      env pools (device)  --execute_mix-->  LW/RW slab pools (device)
      --MatvecV2/_v2_dav-->  ground state (device)  --> psi (host)

    Only the center wavefunction, the initial guess, and scalars cross
    the host<->device link.  All host-side structures (mix plans, v2
    matvec structs, diag structs) are cached across sweeps in `caches`
    (dict with sub-dicts 'mix', 'v2', 'diag'), keyed by site and
    validated against content signatures.

    Reference analog: MovingEnvironment::eff_ham
    (src/dmrg/moving_environment.hpp:2063) + EffectiveHamiltonian::eigs
    (src/dmrg/effective_hamiltonian.hpp:471) with the whole pipeline kept
    on the accelerator.
    """

    def __init__(self, me, eff, dtype=np.float32, caches=None):
        import os as _os
        import time as _time
        _tm = {} if _os.environ.get("B2TPU_SITE_TIMERS") else None
        _t0 = _time.time()
        self.me = me
        self.eff = eff
        self.dtype = dtype
        self.mesh = getattr(me, "mesh", None)
        self.mesh_axis = getattr(me, "mesh_axis", "op")
        t = eff.t
        mpo, g = me.mpo, me.mpo.group
        if caches is None:
            caches = {}
        caches.setdefault("mix", {})
        caches.setdefault("v2", {})
        caches.setdefault("diag", {})
        self.caches = caches

        tk = eff.target
        tb = me.bra.info.target if eff.mixed else tk
        flb, frb = eff.bra_space.fl, eff.bra_space.fr
        flk, frk = eff.ket_space.fl, eff.ket_space.fr
        active_lb = {qL for (qL, _) in eff.bra_space.keys}
        active_rb = {qR for (_, qR) in eff.bra_space.keys}
        active_lk = {qL for (qL, _) in eff.ket_space.keys}
        active_rk = {qR for (_, qR) in eff.ket_space.keys}

        _sync = _os.environ.get("B2TPU_SYNC_MIX")
        meta_l, pool_l = me.device_pool("l", t)
        if _sync:
            pool_l.block_until_ready()
            print(f"      [res t={t}] pool_l ok {pool_l.shape}",
                  flush=True)
        meta_r, pool_r = me.device_pool("r", t + 2)
        if _sync:
            pool_r.block_until_ready()
            print(f"      [res t={t}] pool_r ok {pool_r.shape}",
                  flush=True)
        if _tm is not None:
            _tm["pool"] = _time.time() - _t0
            _t0 = _time.time()

        def plan(key, build, sig):
            ent = caches["mix"].get(key)
            if ent is not None and ent[0] == sig:
                return ent[1]
            p = build()
            caches["mix"][key] = (sig, p)
            return p

        if _mix_ver() >= 4:
            # v4: v3 plan content + packed-upload one-launch tiled
            # execution; falls back to v3 per-plan on budget overflow
            from .mixv3 import build_mix_plan_v3 as _bmp3
            from .mixv4 import plan_v4 as _pv4

            def _bmp(*a, **kw):
                p3 = _bmp3(*a, **kw)
                p4 = _pv4(p3)
                return p4 if p4 is not None else p3
        elif _mix_ver() >= 3:
            from .mixv3 import build_mix_plan_v3 as _bmp
        else:
            _bmp = build_mix_plan
        sig_l = _mix_sig(meta_l, mpo.tensors[t], flb, flk, active_lb,
                         active_lk, None, None, mpo.bond_dqs[t + 1])
        pl = plan((t, "lw"), lambda: _bmp(
            meta_l, mpo.tensors[t], mpo.site_quanta[t], flb,
            bond_is_first=True, join_on_input=True, group=g,
            out_bond_dqs=mpo.bond_dqs[t + 1], active=active_lb,
            fused_ket=flk, active_ket=active_lk), sig_l)
        sig_r = _mix_sig(meta_r, mpo.tensors[t + 1], frb, frk, active_rb,
                         active_rk, tb, tk, mpo.bond_dqs[t + 1])
        pr = plan((t, "rw"), lambda: _bmp(
            meta_r, mpo.tensors[t + 1], mpo.site_quanta[t + 1], frb,
            bond_is_first=False, join_on_input=False, group=g,
            out_bond_dqs=mpo.bond_dqs[t + 1], comp_target=tb,
            active=active_rb, fused_ket=frk, comp_target_ket=tk,
            active_ket=active_rk), sig_r)
        if pl is None or pr is None:
            raise ValueError("empty mix plan (no effective operators)")
        self.pl, self.pr = pl, pr
        if _tm is not None:
            _tm["mixplan"] = _time.time() - _t0
            _t0 = _time.time()
        if _mix_ver() >= 3:
            from .mixv3 import MixPlanV3, execute_mix_v3
            from .mixv4 import MixPlanV4, execute_mix_v4

            def _emx(p, pool, dtype):
                if isinstance(p, MixPlanV4):
                    return execute_mix_v4(p, pool, dtype=dtype)
                return execute_mix_v3(p, pool, dtype=dtype)
        else:
            _emx = execute_mix
        self.lw_pool = _emx(pl, pool_l, dtype=dtype)
        if _sync:
            self.lw_pool.block_until_ready()
            print(f"      [res t={t}] lw mix ok {self.lw_pool.shape}",
                  flush=True)
        self.rw_pool = _emx(pr, pool_r, dtype=dtype)
        if _sync:
            self.rw_pool.block_until_ready()
            print(f"      [res t={t}] rw mix ok {self.rw_pool.shape}",
                  flush=True)
        if _tm is not None:
            self.lw_pool.block_until_ready()
            self.rw_pool.block_until_ready()
            _tm["mixexec"] = _time.time() - _t0
            _t0 = _time.time()

        self.ex = MatvecV2(eff.ket_space, pl.meta_out, pr.meta_out, g,
                           tb, dtype=dtype, cache=caches["v2"],
                           cache_key=(type(eff).__name__, t),
                           bra_space=eff.bra_space)
        if _tm is not None:
            _tm["v2build"] = _time.time() - _t0
            print(f"      [res t={t}] " + " ".join(
                f"{k}={v:.2f}s" for k, v in _tm.items()), flush=True)
        self.size = eff.size
        self._diag_dev = None

    # -- LW/RW materialization (noise / host fallbacks) ----------------
    def host_ops(self, which: str):
        """Download + unpack one side's assembled operators as
        {sym -> {(qb, qk) -> ndarray}} (host) — used by the noise term
        until the device noise kernel covers it."""
        meta, pool = ((self.pl.meta_out, self.lw_pool) if which == "lw"
                      else (self.pr.meta_out, self.rw_pool))
        flat = np.asarray(pool)
        g = self.me.mpo.group
        out: Dict[int, Dict] = {}
        for gi, (dq, syms) in enumerate(meta.groups):
            for qb, (off, db, dk) in meta.sectors[gi].items():
                # LW: qLb = qLk + dq; RW (complemented right half):
                # qRk = qRb + dq (group dq is the left-cumulative MPO
                # bond charge in both metas)
                qk = g.sub(qb, dq) if which == "lw" else g.add(qb, dq)
                for j, s in enumerate(syms):
                    blk = flat[off + j * db * dk:off + (j + 1) * db * dk]
                    if not blk.any():
                        continue
                    out.setdefault(int(s), {})[(qb, qk)] = \
                        blk.reshape(db, dk)
        return out

    # ------------------------------------------------------------------
    def diagonal_device(self):
        if self._diag_dev is None:
            key = ("diag", self.eff.t)
            s = self.ex.struct
            sig = hash((self.pl.meta_out.signature(),
                        self.pr.meta_out.signature(), s["T"], s["nt2"]))
            ent = self.caches["diag"].get(key)
            if ent is not None and ent[0] == sig:
                ds = ent[1]
            else:
                ds = build_diag_struct(self.eff.ket_space,
                                       self.pl.meta_out, self.pr.meta_out,
                                       s["T"], s["nt2"], s["sig_idx"])
                self.caches["diag"][key] = (sig, ds)
            if ds is None:
                raise ValueError("no diagonal contributions")
            self._diag_dev = execute_diag(ds, self.lw_pool, self.rw_pool)
        return self._diag_dev

    def solve_ground_state(self, x0: np.ndarray, conv_thrd: float = 1e-8,
                           max_iter: int = 100, max_subspace: int = 20):
        """On-device Davidson; returns (theta, x[host], n_iter)."""
        s = self.ex.struct
        d = self.ex.to_device()
        dg = self.diagonal_device()
        # diag [sizb_p] -> [size_p + 1]; pad slots are exact zeros (the
        # kernels' dump tiles only ever accumulate zero-valued products)
        diag_p = jnp.concatenate(
            [dg, jnp.zeros(s["size_p"] + 1 - dg.shape[0], dtype=dg.dtype)])
        import os as _os
        lt, rt = self.tile_pools()
        nmb = int(_os.environ.get("B2TPU_MV_BENCH", "0"))
        if nmb > 0 and self.mesh is None:
            import time as _time
            from .tilev2 import _mv_exec
            xb = jnp.asarray(self.ex.pad(x0))
            dd = self.ex.to_device()
            args = (xb, lt, rt, dd["l_tid"], dd["r_tid"], dd["psi_idx"],
                    dd["sig_idx"], dd["it"], dd["cum1"], dd["cum2"],
                    dd["g1"], dd["g2"],
                    jnp.asarray(s["ng_live"], jnp.int32),
                    s["nt1"], s["nt2"], s["T"], s["B"])
            float(_mv_exec(*args)[0])             # compile + warm + sync
            t0 = _time.time()
            acc = jnp.zeros((), dtype=lt.dtype)
            for _ in range(nmb):
                acc = _mv_exec(*args)[0] + acc * 0
            float(acc)                            # chain-synced
            dt = (_time.time() - t0) / nmb
            print(f"      [mv] warm {dt * 1e3:.1f} ms  "
                  f"{s['flops'] / dt / 1e9:.1f} GF/s  "
                  f"T={s['T']} ng={s['ng_live']} "
                  f"flops={s['flops']:.3g}", flush=True)
        if self.mesh is not None:
            g1i, g2i, e1i, e2i, ngl = self.ex.sharded_groups(
                self.mesh, self.mesh_axis)
            th, xv, it = _v2_dav_sharded(
                jnp.asarray(self.ex.pad(x0)), diag_p, lt, rt,
                d["l_tid"], d["r_tid"], d["psi_idx"], d["sig_idx"],
                d["it"], d["cum1"], d["cum2"], g1i, g2i, e1i, e2i, ngl,
                s["nt1"], s["nt2"], s["T"], s["B"], conv_thrd,
                max_iter, max_subspace, self.mesh, self.mesh_axis)
        else:
            th, xv, it = _v2_dav(
                jnp.asarray(self.ex.pad(x0)), diag_p, lt, rt,
                d["l_tid"], d["r_tid"], d["psi_idx"], d["sig_idx"],
                d["it"], d["cum1"], d["cum2"], d["g1"], d["g2"],
                s["ng_live"], conv_thrd, s["nt1"], s["nt2"], s["T"],
                s["B"], max_iter, max_subspace)
        return (float(th), np.asarray(xv, dtype=np.float64)[:self.size],
                int(it))

    def tile_pools(self):
        """Materialized L/R operator tile pools for this site (cached on
        the instance; freed with it)."""
        if getattr(self, "_tile_pools", None) is None:
            self._tile_pools = self.ex.tile_pools(self.lw_pool,
                                                  self.rw_pool)
        return self._tile_pools

    def noise_rho(self, x: np.ndarray, forward: bool):
        """Device-side perturbative-noise density matrix
        {q_bond: [D, D]} for the converged wavefunction x (host flat) —
        replaces downloading the full assembled-operator pool just to
        form sum_m (W_m psi)(W_m psi)^T on the host.  Raises ValueError
        when the structure exceeds the tile budgets (caller falls back
        to the host path)."""
        if np.iscomplexobj(np.zeros(1, self.dtype)):
            raise ValueError("device noise kernel is real-only")
        side = "lw" if forward else "rw"
        meta = self.pl.meta_out if forward else self.pr.meta_out
        s = self.ex.struct
        key = (self.eff.t, side)
        # layout version 2: pre-materialized W tile pools (wtd/w_tid);
        # persisted v1 plans lack the fields and must rebuild
        sig = hash((meta.signature(), tuple(self.eff.ket_space.keys),
                    tuple(sorted(self.eff.ket_space.shapes.items())),
                    s["T"], 2))
        cache = self.caches.setdefault("noise", {})
        ent = cache.get(key)
        if ent is not None and ent[0] == sig:
            plan = ent[1]
        else:
            plan = NoisePlan(self.eff.ket_space, meta,
                             self.me.mpo.group, side, s["T"],
                             s["psi_idx"] if forward else None)
            cache[key] = (sig, plan)
        xp = jnp.asarray(self.ex.pad(x))
        pool = self.lw_pool if forward else self.rw_pool
        return plan.unpack(np.asarray(plan.rho_device(xp, pool)))

    def free(self):
        arrs = [self.lw_pool, self.rw_pool, self._diag_dev]
        arrs += list(getattr(self, "_tile_pools", None) or ())
        self._tile_pools = None
        for a in arrs:
            try:
                if a is not None:
                    a.delete()
            except Exception:
                pass
        self.ex.free()


def execute_diag(dstruct, lpool, rpool, dev_cache=None):
    """Device diagonal of the effective Hamiltonian from LW/RW slab
    pools; returns the flat diag [sizb_p] on device (tiled layout
    flattened through sig_idx)."""
    if dev_cache is None:
        from . import devcache
        tok = dstruct.get("_devtok")
        if tok is None:
            tok = dstruct["_devtok"] = devcache.new_token()
        dev_cache = devcache.get((tok,), lambda: devcache.upload_packed(
            {k: dstruct[k]
             for k in ("gl", "gr", "a4", "b4", "sD", "sig_idx")}))
    else:
        for k in ("gl", "gr", "a4", "b4", "sD", "sig_idx"):
            if k not in dev_cache:
                dev_cache[k] = jnp.asarray(dstruct[k])
    dl = _dl_build(lpool, dev_cache["gl"], dstruct["dl_cap"],
                   dstruct["T"])
    dr = _dl_build(rpool, dev_cache["gr"], dstruct["dr_cap"],
                   dstruct["T"])
    return _slab_diag_impl(dl, dr, dev_cache["a4"], dev_cache["b4"],
                           dev_cache["sD"], dev_cache["sig_idx"],
                           dstruct["nt2"], dstruct["T"])
