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

from .csr import w_nonzero as _w_nonzero

from . import jit_cache  # noqa: F401
import jax
import jax.numpy as jnp
from jax import lax

from ..core.symmetry import QN
from .stacked import StackedMeta, _cap_class
from .tiled import _pow2, pick_tile

# per tile size: (task chunk B, tmp tiles, prod tiles)
_CFG = {16: (8192, 16384, 16384), 32: (8192, 8192, 8192),
        64: (4096, 4096, 4096), 128: (4096, 2048, 2048)}


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
                 "_dev", "_src")


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
        for pb, pk in zip(*_w_nonzero(w)):
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

    # vectorized task construction (per-task Python loops dominate the
    # Cr2 env-init otherwise)
    nit = len(items)
    eoff_a = np.fromiter((it[0] for it in items), np.int64, nit)
    db_a = np.fromiter((it[1] for it in items), np.int64, nit)
    dk_a = np.fromiter((it[2] for it in items), np.int64, nit)
    mb_a = np.fromiter((it[3] for it in items), np.int64, nit)
    mk_a = np.fromiter((it[4] for it in items), np.int64, nit)
    dx_a = np.fromiter((it[5] for it in items), np.int64, nit)
    dy_a = np.fromiter((it[6] for it in items), np.int64, nit)
    nl_a = -(-db_a // T)
    nk_a = -(-dk_a // T)
    nx_a = -(-dx_a // T)
    ny_a = -(-dy_a // T)
    # valid flattened entries per item (stage 3)
    e_item, e_base, e_odx, e_ody, e_cf = [], [], [], [], []
    nval = np.zeros(nit, dtype=np.int64)
    for i, it in enumerate(items):
        qrb = it[8]
        for (osym, cf) in it[7]:
            gp = meta_out.sym_pos.get(osym)
            if gp is None:
                continue
            go, jo = gp
            ent = meta_out.sectors[go].get(qrb)
            if ent is None:
                continue
            ooff, odx, ody = ent
            e_item.append(i)
            e_base.append(ooff + jo * odx * ody)
            e_odx.append(odx)
            e_ody.append(ody)
            e_cf.append(cf)
            nval[i] += 1
    n_ents_alloc = np.fromiter((len(it[7]) for it in items), np.int64,
                               nit)
    itmp = nl_a * ny_a
    iprod = nx_a * ny_a
    n1_a = itmp * nk_a
    n2_a = iprod * nl_a
    n3_alloc = iprod * n_ents_alloc
    n3_val = iprod * nval
    if nit and (itmp.max() > nt1 or iprod.max() > ntp or n1_a.max() > B
                or n2_a.max() > B or n3_alloc.max() > B):
        raise ValueError(f"block too large for T={T}")
    # greedy grouping (budget uses the conservative stage-3 count)
    grp = np.empty(nit, dtype=np.int64)
    tb_a = np.empty(nit, dtype=np.int64)
    pb_a2 = np.empty(nit, dtype=np.int64)
    o1_a = np.empty(nit, dtype=np.int64)
    o2_a = np.empty(nit, dtype=np.int64)
    o3_a = np.empty(nit, dtype=np.int64)
    g = tu = pu = u1 = u2 = u3a = u3v = 0
    for i in range(nit):
        if (tu + itmp[i] > nt1 or pu + iprod[i] > ntp
                or u1 + n1_a[i] > B or u2 + n2_a[i] > B
                or u3a + n3_alloc[i] > B):
            g += 1
            tu = pu = u1 = u2 = u3a = u3v = 0
        grp[i] = g
        tb_a[i] = tu
        pb_a2[i] = pu
        o1_a[i] = u1
        o2_a[i] = u2
        o3_a[i] = u3v
        tu += itmp[i]
        pu += iprod[i]
        u1 += n1_a[i]
        u2 += n2_a[i]
        u3a += n3_alloc[i]
        u3v += n3_val[i]
    ng = (g + 1) if nit else 0
    G = _pow2(max(ng, 1))
    s1A = np.zeros((G, 9, B), dtype=np.int64)
    s1A[:, 8, :] = nt1
    s2A = np.zeros((G, 6, B), dtype=np.int64)
    s2A[:, 5, :] = ntp
    s3A = np.zeros((G, 5, B), dtype=np.int64)
    s3A[:, 1, :] = -1
    cfA = np.zeros((G, B), dtype=np.complex128 if iscpx else np.float64)
    if nit:
        # stage 1: tasks ordered (li, yi, ki)
        tot = int(n1_a.sum())
        itm = np.repeat(np.arange(nit), n1_a)
        cum = np.concatenate([[0], np.cumsum(n1_a)[:-1]])
        o = np.arange(tot) - np.repeat(cum, n1_a)
        nk1 = nk_a[itm]
        ny1 = ny_a[itm]
        li = o // (ny1 * nk1)
        yi = (o // nk1) % ny1
        ki = o % nk1
        gi = grp[itm]
        pos = np.repeat(o1_a, n1_a) + o
        dkI = dk_a[itm]
        dyI = dy_a[itm]
        s1A[gi, 0, pos] = eoff_a[itm] + li * T * dkI + ki * T
        s1A[gi, 1, pos] = dkI
        s1A[gi, 2, pos] = db_a[itm] - li * T
        s1A[gi, 3, pos] = dkI - ki * T
        if left:
            s1A[gi, 4, pos] = koffs[mk_a[itm]] + ki * T * dyI + yi * T
            s1A[gi, 5, pos] = dyI
            s1A[gi, 6, pos] = dkI - ki * T
            s1A[gi, 7, pos] = dyI - yi * T
        else:
            s1A[gi, 4, pos] = koffs[mk_a[itm]] + yi * T * dkI + ki * T
            s1A[gi, 5, pos] = dkI
            s1A[gi, 6, pos] = dyI - yi * T
            s1A[gi, 7, pos] = dkI - ki * T
        s1A[gi, 8, pos] = np.repeat(tb_a, n1_a) + li * ny1 + yi
        # stage 2: tasks ordered (xi, yi, li)
        tot = int(n2_a.sum())
        itm = np.repeat(np.arange(nit), n2_a)
        cum = np.concatenate([[0], np.cumsum(n2_a)[:-1]])
        o = np.arange(tot) - np.repeat(cum, n2_a)
        nl2 = nl_a[itm]
        ny2 = ny_a[itm]
        xi = o // (ny2 * nl2)
        yi = (o // nl2) % ny2
        li = o % nl2
        gi = grp[itm]
        pos = np.repeat(o2_a, n2_a) + o
        dbI = db_a[itm]
        dxI = dx_a[itm]
        if left:
            s2A[gi, 0, pos] = boffs[mb_a[itm]] + li * T * dxI + xi * T
            s2A[gi, 1, pos] = dxI
            s2A[gi, 2, pos] = dbI - li * T
            s2A[gi, 3, pos] = dxI - xi * T
        else:
            s2A[gi, 0, pos] = boffs[mb_a[itm]] + xi * T * dbI + li * T
            s2A[gi, 1, pos] = dbI
            s2A[gi, 2, pos] = dxI - xi * T
            s2A[gi, 3, pos] = dbI - li * T
        s2A[gi, 4, pos] = np.repeat(tb_a, n2_a) + li * ny2 + yi
        s2A[gi, 5, pos] = np.repeat(pb_a2, n2_a) + xi * ny2 + yi
        # stage 3: per valid entry, tiles ordered (xi, yi)
        nve = len(e_item)
        if nve:
            e_item_a = np.asarray(e_item, dtype=np.int64)
            per = iprod[e_item_a]
            tot = int(per.sum())
            ei = np.repeat(np.arange(nve), per)
            cum = np.concatenate([[0], np.cumsum(per)[:-1]])
            o = np.arange(tot) - np.repeat(cum, per)
            it3 = e_item_a[ei]
            ny3 = ny_a[it3]
            xi = o // ny3
            yi = o % ny3
            gi = grp[it3]
            # position: per-item stage-3 base + offset of this entry's
            # tile block within the item
            ent_rank = np.zeros(nve, dtype=np.int64)
            r = 0
            prev = -1
            for k2 in range(nve):
                if e_item[k2] != prev:
                    r = 0
                    prev = e_item[k2]
                ent_rank[k2] = r
                r += 1
            pos = np.repeat(o3_a[e_item_a] + ent_rank * iprod[e_item_a],
                            per) + o
            odyI = np.asarray(e_ody, dtype=np.int64)[ei]
            odxI = np.asarray(e_odx, dtype=np.int64)[ei]
            s3A[gi, 0, pos] = np.repeat(pb_a2[e_item_a], per) \
                + xi * ny3 + yi
            s3A[gi, 1, pos] = np.asarray(e_base, dtype=np.int64)[ei] \
                + xi * T * odyI + yi * T
            s3A[gi, 2, pos] = odyI
            s3A[gi, 3, pos] = odxI - xi * T
            s3A[gi, 4, pos] = odyI - yi * T
            cfA[gi, pos] = np.asarray(e_cf)[ei]
    g_s1 = list(s1A)
    g_s2 = list(s2A)
    g_s3 = list(s3A)
    g_cf = list(cfA)

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
    plan._src = (bra_T, ket_T)
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
