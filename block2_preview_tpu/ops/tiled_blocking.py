"""Tiled compile-once blocking engine on stacked environment pools.

Replaces the per-shape-bucket kernels of `ops/stacked.py` (whose jit
signatures explode combinatorially on quantum-chemistry systems: ~1.6k
distinct compiles over the first 12 Cr2/SVP sites) with the fixed-tile
formulation of `ops/tiled.py`: every blocking contribution

    E'[o][(qrb, qrk)] += w[pb, pk] * mb^H E[i][(qlb, qlk)] mk     (left)
    E'[i][(qlb, qlk)] += w[pb, pk] * mb  E[o][(qrb, qrk)] mk^H    (right)

is decomposed into T x T tile tasks over three stages:

  stage 1:  tmp(l, y)  += E_tile(l, k) . mk_tile(k, y)    [batched MXU]
  stage 2:  prod(x, y) += mb_tile(l, x)^T . tmp(l, y)
  stage 3:  out_pool  .at[block positions].add(coef * prod tiles)

Task arrays are data; jit signatures depend only on (tile size, chunk
size, pool capacity classes, group count) — a handful of compiles per
run, shared across sites/sweeps and persisted in the XLA disk cache.
Reference analog: TensorFunctions::left_contract (tensor_functions.hpp:
2842) + OperatorFunctions::tensor_rotate dispatched through BatchGEMM.

The environment pool layout (StackedMeta slabs) is unchanged, so this is
a drop-in alternative executor inside MovingEnvironment._stk_contract.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Tuple

import numpy as np

from . import jit_cache  # noqa: F401
import jax
import jax.numpy as jnp
from jax import lax

from ..core.symmetry import QN
from .stacked import StackedMeta, _cap_class
from .tiled import _pow2, pick_tile

# per tile size: (task chunk B, tmp tiles, prod tiles)
_CFG = {16: (16384, 32768, 32768), 32: (8192, 8192, 8192),
        64: (4096, 4096, 4096), 128: (1024, 1024, 1024)}


def _grid(r: int, c: int, T: int) -> Tuple[int, int]:
    return -(-r // T), -(-c // T)


def _gtile(pool, base, stride, rmax, cmax, T):
    """Gather [B, T, T] tiles from a flat pool; (base + r*stride + c) with
    r < rmax, c < cmax masked to the sentinel (last) slot."""
    r = jnp.arange(T)[None, :, None]
    c = jnp.arange(T)[None, None, :]
    idx = base[:, None, None] + r * stride[:, None, None] + c
    ok = (r < rmax[:, None, None]) & (c < cmax[:, None, None])
    return pool[jnp.where(ok, idx, pool.shape[0] - 1)]


@partial(jax.jit, static_argnames=("nt1", "ntp", "T", "left", "ncap"))
def _tiled_blocking_exec(epool, bpool, kpool, s1, s2, s3, coef,
                         nt1, ntp, T, left, ncap):
    """Run all groups of a tiled blocking plan; returns out pool [ncap].

    s1 [G, 9, B1]: ebase, estr, ermax, ecmax, kbase, kstr, krmax, kcmax,
                   tmp-tile-id
    s2 [G, 6, B2]: bbase, bstr, brmax, bcmax, tmp-tile-src, prod-tile-id
    s3 [G, 5, B3]: prod-tile-src, obase, ostr, ormax, ocmax
    coef [G, B3]
    """
    out0 = jnp.zeros(ncap, dtype=epool.dtype)
    hi = lax.Precision.HIGHEST

    def body(out, g):
        g1, g2, g3, cf = g
        E = _gtile(epool, g1[0], g1[1], g1[2], g1[3], T)
        K = _gtile(kpool, g1[4], g1[5], g1[6], g1[7], T)
        if left:
            p1 = jnp.einsum("blk,bky->bly", E, K, precision=hi,
                            preferred_element_type=epool.dtype)
        else:
            p1 = jnp.einsum("blk,byk->bly", E, K, precision=hi,
                            preferred_element_type=epool.dtype)
        tmp = jax.ops.segment_sum(p1, g1[8], num_segments=nt1 + 1,
                                  indices_are_sorted=True)
        Bm = _gtile(bpool, g2[0], g2[1], g2[2], g2[3], T)
        if left:
            p2 = jnp.einsum("blx,bly->bxy", Bm, tmp[g2[4]], precision=hi,
                            preferred_element_type=epool.dtype)
        else:
            p2 = jnp.einsum("bxl,bly->bxy", Bm, tmp[g2[4]], precision=hi,
                            preferred_element_type=epool.dtype)
        prod = jax.ops.segment_sum(p2, g2[5], num_segments=ntp + 1,
                                   indices_are_sorted=True)
        vals = prod[g3[0]] * cf[:, None, None]
        r = jnp.arange(T)[None, :, None]
        c = jnp.arange(T)[None, None, :]
        idx = g3[1][:, None, None] + r * g3[2][:, None, None] + c
        ok = (r < g3[3][:, None, None]) & (c < g3[4][:, None, None]) & \
            (g3[1][:, None, None] >= 0)
        out = out.at[jnp.where(ok, idx, ncap)].add(vals, mode="drop")
        return out, 0

    out, _ = lax.scan(body, out0, (s1, s2, s3, coef))
    return out


class TiledBlockingPlan:
    __slots__ = ("meta_out", "T", "nt1", "ntp", "ncap", "left",
                 "s1", "s2", "s3", "coef", "bra_pool", "ket_pool",
                 "_dev")


def build_tiled_blocking_plan(meta_in: StackedMeta, entries, quanta,
                              bra_T, ket_T, group, direction: str,
                              bond_dqs_in, bond_dqs_out,
                              T: Optional[int] = None
                              ) -> Optional[TiledBlockingPlan]:
    """Same contract as ops.stacked.build_stacked_plan, tiled execution."""
    left = direction == "left"

    # site tensor registries keyed (bond sector, phys state) -> flat pools
    bra_tab: Dict[Tuple[QN, int], Tuple[int, Tuple[int, int], QN]] = {}
    ket_tab: Dict[Tuple[QN, int], Tuple[int, Tuple[int, int], QN]] = {}
    bra_mats: List[np.ndarray] = []
    ket_mats: List[np.ndarray] = []

    def reg(Tn, tab, mats):
        for (ql, qp, qr), b in sorted(Tn.blocks.items()):
            for p, q in enumerate(quanta):
                if q != qp:
                    continue
                m = b.reshape(b.shape[0], b.shape[2])
                if left:
                    tab[(ql, p)] = (len(mats), m.shape, qr)
                else:
                    tab[(qr, p)] = (len(mats), m.shape, ql)
                mats.append(m)

    reg(bra_T, bra_tab, bra_mats)
    reg(ket_T, ket_tab, ket_mats)
    if not bra_mats or not ket_mats:
        return None
    boffs = np.concatenate(
        [[0], np.cumsum([m.size for m in bra_mats])]).astype(np.int64)
    koffs = np.concatenate(
        [[0], np.cumsum([m.size for m in ket_mats])]).astype(np.int64)

    # entries grouped by (in-group, pb, pk, j) -> [(osym, coef)]
    ent_by: Dict[Tuple[int, int, int], Dict[int, List]] = {}
    for (i, o), w in sorted(entries.items()):
        jsym = i if left else o
        osym = o if left else i
        gp = meta_in.sym_pos.get(jsym)
        if gp is None:
            continue
        g, j = gp
        for pb, pk in zip(*np.nonzero(w)):
            ent_by.setdefault((g, int(pb), int(pk)), {}).setdefault(
                j, []).append((osym, complex(w[pb, pk]) if
                               np.iscomplexobj(w) else float(w[pb, pk])))

    # item list + output sectors
    out_sym_sectors: Dict[int, Dict[QN, Tuple[int, int]]] = {}
    items = []   # (eoff_j, db, dk, mb_id, mk_id, dx, dy, ents_j, qrb)
    dims = []
    for (g, pb, pk), by_j in sorted(ent_by.items()):
        dq_g, syms = meta_in.groups[g]
        for qlb, (eoff, db, dkk) in sorted(meta_in.sectors[g].items()):
            qlk = group.sub(qlb, dq_g)
            vb = bra_tab.get((qlb, pb))
            vk = ket_tab.get((qlk, pk))
            if vb is None or vk is None:
                continue
            mb_id, (s1_, s2_), qrb = vb
            mk_id, (t1_, t2_), _qrk = vk
            if left:
                dl, dx = s1_, s2_
                dkk2, dy = t1_, t2_
            else:
                dx, dl = s1_, s2_
                dy, dkk2 = t1_, t2_
            assert dl == db and dkk2 == dkk
            for j, ents in sorted(by_j.items()):
                items.append((eoff + j * db * dkk, db, dkk, mb_id, mk_id,
                              dx, dy, ents, qrb))
                for (osym, _cf) in ents:
                    d = out_sym_sectors.setdefault(osym, {})
                    if qrb not in d:
                        d[qrb] = (dx, dy)
            dims += [db, dkk, dx, dy]
    if not items:
        return None
    meta_out = StackedMeta.from_bond(bond_dqs_out, out_sym_sectors)
    if T is None:
        T = pick_tile(np.asarray(dims))
    B, nt1, ntp = _CFG[T]
    ncap = _cap_class(meta_out.total + 1)

    iscpx = any(np.iscomplexobj(m) for m in bra_mats + ket_mats) or \
        any(isinstance(cf, complex) for it in items for (_o, cf) in it[7])

    g_s1: List[np.ndarray] = []
    g_s2: List[np.ndarray] = []
    g_s3: List[np.ndarray] = []
    g_cf: List[np.ndarray] = []
    c1, c2, c3, ccf = [], [], [], []
    tmp_used = 0
    prod_used = 0

    def close():
        nonlocal tmp_used, prod_used
        if not c1 and not c2 and not c3:
            return
        s1 = np.zeros((9, B), dtype=np.int64)
        s1[8, :] = nt1                      # sentinel tmp target
        s1[:, :len(c1)] = np.asarray(c1, dtype=np.int64).T
        if len(c1) < B:                     # sentinel gathers: rmax/cmax=0
            s1[2, len(c1):] = 0
        s2 = np.zeros((6, B), dtype=np.int64)
        s2[4, len(c2):] = 0
        s2[5, :] = ntp
        s2[:, :len(c2)] = np.asarray(c2, dtype=np.int64).T
        s3 = np.zeros((5, B), dtype=np.int64)
        s3[1, :] = -1                       # sentinel out target
        s3[:, :len(c3)] = np.asarray(c3, dtype=np.int64).T
        cf = np.zeros(B, dtype=np.complex128 if iscpx else np.float64)
        cf[:len(ccf)] = ccf
        g_s1.append(s1)
        g_s2.append(s2)
        g_s3.append(s3)
        g_cf.append(cf)
        c1.clear()
        c2.clear()
        c3.clear()
        ccf.clear()
        tmp_used = 0
        prod_used = 0

    for (eoff, db, dk, mb_id, mk_id, dx, dy, ents, qrb) in items:
        nl, nk = _grid(db, dk, T)
        nx, ny = _grid(dx, dy, T)
        item_tmp = nl * ny
        item_prod = nx * ny
        n1 = nl * ny * nk
        n2 = nx * ny * nl
        n3 = nx * ny * len(ents)
        if (tmp_used + item_tmp > nt1 or prod_used + item_prod > ntp
                or len(c1) + n1 > B or len(c2) + n2 > B
                or len(c3) + n3 > B):
            close()
        if item_tmp > nt1 or item_prod > ntp or n1 > B or n2 > B \
                or n3 > B:
            raise ValueError(f"block too large for T={T}: "
                             f"{(db, dk, dx, dy, len(ents))}")
        tb, pb_ = tmp_used, prod_used
        # stage 1: tmp(l, y) tiles
        for li in range(nl):
            for yi in range(ny):
                tid = tb + li * ny + yi
                for ki in range(nk):
                    if left:
                        # E (db x dk) tile (li, ki); mk (dk x dy) (ki, yi)
                        kb = koffs[mk_id] + (ki * T) * dy + yi * T
                        kst, krm, kcm = dy, dk - ki * T, dy - yi * T
                    else:
                        # mk stored (dy x dk): tile (yi, ki)
                        kb = koffs[mk_id] + (yi * T) * dk + ki * T
                        kst, krm, kcm = dk, dy - yi * T, dk - ki * T
                    c1.append((eoff + (li * T) * dk + ki * T, dk,
                               db - li * T, dk - ki * T,
                               kb, kst, krm, kcm, tid))
        # stage 2: prod(x, y) tiles
        for xi in range(nx):
            for yi in range(ny):
                pid = pb_ + xi * ny + yi
                for li in range(nl):
                    if left:
                        # mb (db x dx): tile (li, xi)
                        bb = boffs[mb_id] + (li * T) * dx + xi * T
                        bst, brm, bcm = dx, db - li * T, dx - xi * T
                    else:
                        # mb (dx x db): tile (xi, li)
                        bb = boffs[mb_id] + (xi * T) * db + li * T
                        bst, brm, bcm = db, dx - xi * T, db - li * T
                    c2.append((bb, bst, brm, bcm, tb + li * ny + yi, pid))
        # stage 3: scatter prod tiles into out slabs per entry
        for (osym, cf) in ents:
            gp = meta_out.sym_pos.get(osym)
            if gp is None:
                continue
            go, jo = gp
            ent = meta_out.sectors[go].get(qrb)
            if ent is None:
                continue
            ooff, odx, ody = ent
            base = ooff + jo * odx * ody
            for xi in range(nx):
                for yi in range(ny):
                    c3.append((pb_ + xi * ny + yi,
                               base + (xi * T) * ody + yi * T, ody,
                               odx - xi * T, ody - yi * T))
                    ccf.append(cf)
        tmp_used += item_tmp
        prod_used += item_prod
    close()

    G = _pow2(max(len(g_s1), 1))
    while len(g_s1) < G:
        s1 = np.zeros((9, B), dtype=np.int64)
        s1[8, :] = nt1
        s2 = np.zeros((6, B), dtype=np.int64)
        s2[5, :] = ntp
        s3 = np.zeros((5, B), dtype=np.int64)
        s3[1, :] = -1
        g_s1.append(s1)
        g_s2.append(s2)
        g_s3.append(s3)
        g_cf.append(np.zeros(B, dtype=np.complex128 if iscpx
                             else np.float64))

    plan = TiledBlockingPlan()
    plan.meta_out = meta_out
    plan.T = T
    plan.nt1 = nt1
    plan.ntp = ntp
    plan.ncap = ncap
    plan.left = left
    plan.s1 = np.stack(g_s1)
    plan.s2 = np.stack(g_s2)
    plan.s3 = np.stack(g_s3)
    plan.coef = np.stack(g_cf)
    plan.bra_pool = (bra_mats, boffs)
    plan.ket_pool = (ket_mats, koffs)
    plan._dev = None
    return plan


def execute_tiled_blocking(plan: TiledBlockingPlan, epool_dev,
                           dtype=np.float32):
    """Run the plan on the device input pool; returns the output pool."""
    dev = plan._dev
    if dev is None or dev[0] != dtype:
        def pack(mats, offs):
            pool = np.zeros(int(offs[-1]) + 1, dtype=dtype)
            for m, o in zip(mats, offs[:-1]):
                pool[o:o + m.size] = np.asarray(m, dtype=dtype).ravel()
            full = np.zeros(_cap_class(len(pool)), dtype=dtype)
            full[:len(pool)] = pool
            return jnp.asarray(full)

        cf = plan.coef
        if not np.iscomplexobj(np.zeros(1, dtype)):
            cf = cf.real
        dev = (dtype, pack(*plan.bra_pool), pack(*plan.ket_pool),
               jnp.asarray(plan.s1), jnp.asarray(plan.s2),
               jnp.asarray(plan.s3), jnp.asarray(cf.astype(dtype)))
        plan._dev = dev
    _dt, bpool, kpool, s1, s2, s3, coef = dev
    return _tiled_blocking_exec(epool_dev, bpool, kpool, s1, s2, s3, coef,
                                plan.nt1, plan.ntp, plan.T, plan.left,
                                plan.ncap)
