"""Blocking engine v2: in-kernel task derivation over stacked env pools.

The v1 tiled blocking engine (ops/tiled_blocking.py) expands every T x T
tile task into explicit descriptor rows on the host: [G, 9+6+5+1, B]
arrays that reach hundreds of MB at quantum-chemistry bonds and crash
the TPU worker when carried through `lax.scan` (the recurring Cr2
mid-chain 'site 13/14' fault).  v2 follows ops/tilev2.MatvecV2: upload
only per-ITEM descriptors (one row per (env group, MPO phys entry,
symbol, sector) contribution, ~10^4-10^5 per site, a few MB) and derive
each tile task inside the kernel from its task index:

    item = searchsorted(cum_tasks, tau) - 1
    o    = tau - cum_tasks[item]
    (li, yi, ki) / (xi, yi, li) / (xi, yi) = divmod chains over the
    item's tile grid; bases/strides/masks are affine in the item fields.

The computation per contribution (same contract as
ops.stacked.build_stacked_plan):

    E'[o][(qrb, qrk)] += w[pb, pk] * mb^H E[i][(qlb, qlk)] mk     (left)
    E'[i][(qlb, qlk)] += w[pb, pk] * mb  E[o][(qrb, qrk)] mk^H    (right)

in three stages per scan step (one group of bounded task budgets):

    stage 1:  tmp(l, y)  += E_tile(l, k) . mk_tile(k, y)    [batched MXU]
    stage 2:  prod(x, y) += mb_tile(l, x)^T . tmp(l, y)
    stage 3:  out_pool  .at[block positions].add(coef * prod tiles)

jit signatures depend only on (T, B, capacity classes, scan depth).
Reference analog: TensorFunctions::left_contract
(src/core/tensor_functions.hpp:2842) + OperatorFunctions::tensor_rotate
(src/core/operator_functions.hpp:175) dispatched through BatchGEMM
(src/core/batch_gemm.hpp), with the schedule derived on the accelerator.
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
from .tilev2 import _gtile, _locate, _quant

# per tile size: (stage task capacity B, tmp tiles, prod tiles)
_CFG = {16: (8192, 16384, 16384), 32: (8192, 8192, 8192),
        64: (4096, 4096, 4096), 128: (4096, 2048, 2048)}


def _blk_scan(epool, bpool, kpool, it, ef, coef, cum1, cum2, cum3,
              g1, g2, g3, e1, e2, e3, nt1, ntp, T, B, left, ncap,
              vary_axis=None):
    """Scan over task groups; returns the accumulated output pool
    [ncap] (index ncap scatters are dropped).  it [n, 13] int32 item
    fields: ebase, dk, db, kbase, dy, bbase, dx, nl, nk, nx, ny,
    tb(tmp base), pb(prod base); ef [ne, 4]: item, obase, odx, ody;
    coef [ne]; cum1/cum2 [n+1] stage-1/2 task prefix sums; cum3 [ne+1]
    stage-3 tile prefix sums; g1/g2/g3 [nscan] first task ids per scan
    step, e1/e2/e3 the matching end ids."""
    hi = lax.Precision.HIGHEST
    r = jnp.arange(T, dtype=jnp.int32)[None, :, None]
    c = jnp.arange(T, dtype=jnp.int32)[None, None, :]

    def body(out, g):
        g1s, g2s, g3s, e1s, e2s, e3s = g
        # stage 1: tasks (li, yi, ki) -> tmp tiles
        i1, o1, v1 = _locate(cum1, g1s, e1s, B)
        f = it[i1]
        nk, ny = f[:, 8], f[:, 10]
        li = o1 // (ny * nk)
        yi = (o1 // nk) % ny
        ki = o1 % nk
        eb = jnp.where(v1, f[:, 0] + li * T * f[:, 1] + ki * T, -1)
        E = _gtile(epool, eb, f[:, 1], f[:, 2] - li * T,
                   f[:, 1] - ki * T, T)
        if left:
            kb = jnp.where(v1, f[:, 3] + ki * T * f[:, 4] + yi * T, -1)
            K = _gtile(kpool, kb, f[:, 4], f[:, 1] - ki * T,
                       f[:, 4] - yi * T, T)
            p1 = jnp.einsum("blk,bky->bly", E, K, precision=hi,
                            preferred_element_type=epool.dtype)
        else:
            kb = jnp.where(v1, f[:, 3] + yi * T * f[:, 1] + ki * T, -1)
            K = _gtile(kpool, kb, f[:, 1], f[:, 4] - yi * T,
                       f[:, 1] - ki * T, T)
            p1 = jnp.einsum("blk,byk->bly", E, K, precision=hi,
                            preferred_element_type=epool.dtype)
        s1 = jnp.where(v1, f[:, 11] + li * ny + yi, nt1)
        tmp = jax.ops.segment_sum(p1, s1, num_segments=nt1 + 1,
                                  indices_are_sorted=True)
        # stage 2: tasks (xi, yi, li) -> prod tiles
        i2, o2, v2 = _locate(cum2, g2s, e2s, B)
        f = it[i2]
        nl, ny = f[:, 7], f[:, 10]
        xi = o2 // (ny * nl)
        yi = (o2 // nl) % ny
        li = o2 % nl
        if left:
            bb = jnp.where(v2, f[:, 5] + li * T * f[:, 6] + xi * T, -1)
            Bm = _gtile(bpool, bb, f[:, 6], f[:, 2] - li * T,
                        f[:, 6] - xi * T, T)
            lhs = "blx"
        else:
            bb = jnp.where(v2, f[:, 5] + xi * T * f[:, 2] + li * T, -1)
            Bm = _gtile(bpool, bb, f[:, 2], f[:, 6] - xi * T,
                        f[:, 2] - li * T, T)
            lhs = "bxl"
        ta = jnp.where(v2, f[:, 11] + li * ny + yi, nt1)
        p2 = jnp.einsum(f"{lhs},bly->bxy", Bm, tmp[ta], precision=hi,
                        preferred_element_type=epool.dtype)
        sp = jnp.where(v2, f[:, 12] + xi * ny + yi, ntp)
        prod = jax.ops.segment_sum(p2, sp, num_segments=ntp + 1,
                                   indices_are_sorted=True)
        # stage 3: tasks (xi, yi) per output entry -> scatter into pool
        j3, o3, v3 = _locate(cum3, g3s, e3s, B)
        e = ef[j3]
        fi = it[e[:, 0]]
        ny3 = fi[:, 10]
        xi = o3 // ny3
        yi = o3 % ny3
        src = jnp.where(v3, fi[:, 12] + xi * ny3 + yi, ntp)
        vals = prod[src] * coef[j3][:, None, None]
        ody = e[:, 3][:, None, None]
        idx = e[:, 1][:, None, None] + (xi[:, None, None] * T + r) * ody \
            + yi[:, None, None] * T + c
        ok = v3[:, None, None] \
            & (r < (e[:, 2][:, None, None] - xi[:, None, None] * T)) \
            & (c < (ody - yi[:, None, None] * T))
        out = out.at[jnp.where(ok, idx, ncap)].add(
            jnp.where(ok, vals, 0), mode="drop")
        return out, 0

    out0 = jnp.zeros(ncap, dtype=epool.dtype)
    if vary_axis is not None:
        out0 = lax.pvary(out0, (vary_axis,))
    out, _ = lax.scan(body, out0, (g1, g2, g3, e1, e2, e3))
    return out


@partial(jax.jit, static_argnames=("nt1", "ntp", "T", "B", "left",
                                   "ncap", "nscan"))
def _blk_exec(epool, bpool, kpool, it, ef, coef, cum1, cum2, cum3,
              g1, g2, g3, nt1, ntp, T, B, left, ncap, nscan):
    e1 = jnp.concatenate([g1[1:], cum1[-1:]])
    e2 = jnp.concatenate([g2[1:], cum2[-1:]])
    e3 = jnp.concatenate([g3[1:], cum3[-1:]])
    return _blk_scan(epool, bpool, kpool, it, ef, coef, cum1, cum2,
                     cum3, g1, g2, g3, e1, e2, e3, nt1, ntp, T, B,
                     left, ncap)


@partial(jax.jit, static_argnames=("nt1", "ntp", "T", "B", "left",
                                   "ncap", "nscan", "mesh", "axis"))
def _blk_exec_sharded(epool, bpool, kpool, it, ef, coef, cum1, cum2,
                      cum3, g1, g2, g3, nt1, ntp, T, B, left, ncap,
                      nscan, mesh, axis):
    """Blocking with the task-group axis sharded over the mesh axis and
    partial output pools psum'd — block2's distributed left_contract
    (owner-computes per operator, reduce of partials,
    src/core/parallel_tensor_functions.hpp)."""
    from jax.sharding import PartitionSpec as P
    e1 = jnp.concatenate([g1[1:], cum1[-1:]])
    e2 = jnp.concatenate([g2[1:], cum2[-1:]])
    e3 = jnp.concatenate([g3[1:], cum3[-1:]])

    def local(g1s, g2s, g3s, e1s, e2s, e3s, ep, bp, kp, itl, efl, cf,
              c1, c2, c3):
        out = _blk_scan(ep, bp, kp, itl, efl, cf, c1, c2, c3,
                        g1s, g2s, g3s, e1s, e2s, e3s, nt1, ntp, T, B,
                        left, ncap, vary_axis=axis)
        return lax.psum(out, axis)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(), P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=P())(g1, g2, g3, e1, e2, e3, epool, bpool, kpool,
                       it, ef, coef, cum1, cum2, cum3)


class BlockingV2Plan:
    __slots__ = ("meta_out", "T", "B", "nt1", "ntp", "ncap", "left",
                 "it", "ef", "coef", "cum1", "cum2", "cum3",
                 "g1", "g2", "g3", "bra_pool", "ket_pool", "flops",
                 "_dev", "_src")


def build_blocking_v2(meta_in: StackedMeta, entries, quanta,
                      bra_T, ket_T, group, direction: str,
                      bond_dqs_in, bond_dqs_out,
                      T: Optional[int] = None
                      ) -> Optional[BlockingV2Plan]:
    """Same contract as ops.stacked.build_stacked_plan; compact per-item
    plan executed by _blk_exec.  Retries with a larger tile on budget
    overflow (a single huge block can exceed the per-group task budget
    at small T)."""
    left = direction == "left"

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

    # entries grouped by (env group, pb, pk) then symbol j
    ent_by: Dict[Tuple[int, int, int], Dict[int, List]] = {}
    iscpx = any(np.iscomplexobj(m) for m in bra_mats + ket_mats)
    for (i, o), w in sorted(entries.items()):
        jsym = i if left else o
        osym = o if left else i
        gp = meta_in.sym_pos.get(jsym)
        if gp is None:
            continue
        g, j = gp
        if np.iscomplexobj(w):
            iscpx = True
        for pb, pk in zip(*np.nonzero(w)):
            ent_by.setdefault((g, int(pb), int(pk)), {}).setdefault(
                j, []).append((osym, complex(w[pb, pk]) if
                               np.iscomplexobj(w) else float(w[pb, pk])))

    out_sym_sectors: Dict[int, Dict[QN, Tuple[int, int]]] = {}
    items = []   # (ebase, db, dk, mb_id, mk_id, dx, dy, ents, qrb)
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

    nit = len(items)
    eoff_a = np.fromiter((x[0] for x in items), np.int64, nit)
    db_a = np.fromiter((x[1] for x in items), np.int64, nit)
    dk_a = np.fromiter((x[2] for x in items), np.int64, nit)
    mb_a = np.fromiter((x[3] for x in items), np.int64, nit)
    mk_a = np.fromiter((x[4] for x in items), np.int64, nit)
    dx_a = np.fromiter((x[5] for x in items), np.int64, nit)
    dy_a = np.fromiter((x[6] for x in items), np.int64, nit)
    nent_a = np.fromiter((len(x[7]) for x in items), np.int64, nit)

    while True:
        B, nt1, ntp = _CFG[T]
        nl_a = -(-db_a // T)
        nk_a = -(-dk_a // T)
        nx_a = -(-dx_a // T)
        ny_a = -(-dy_a // T)
        itmp = nl_a * ny_a
        iprod = nx_a * ny_a
        n1_a = itmp * nk_a
        n2_a = iprod * nl_a
        n3_a = iprod * nent_a
        if (itmp.max() <= nt1 and iprod.max() <= ntp
                and n1_a.max() <= B and n2_a.max() <= B
                and n3_a.max() <= B):
            break
        if T >= 128:
            raise ValueError("block too large for any tile config")
        T *= 2

    # greedy grouping under per-stage budgets
    tb_a = np.empty(nit, dtype=np.int64)
    pb_a = np.empty(nit, dtype=np.int64)
    gfirst1, gfirst2, gfirst3 = [0], [0], [0]
    c1 = np.concatenate([[0], np.cumsum(n1_a)]).astype(np.int64)
    c2 = np.concatenate([[0], np.cumsum(n2_a)]).astype(np.int64)
    c3 = np.concatenate([[0], np.cumsum(n3_a)]).astype(np.int64)
    tu = pu = u1 = u2 = u3 = 0
    for i in range(nit):
        if (tu + itmp[i] > nt1 or pu + iprod[i] > ntp
                or u1 + n1_a[i] > B or u2 + n2_a[i] > B
                or u3 + n3_a[i] > B):
            gfirst1.append(int(c1[i]))
            gfirst2.append(int(c2[i]))
            gfirst3.append(int(c3[i]))
            tu = pu = u1 = u2 = u3 = 0
        tb_a[i] = tu
        pb_a[i] = pu
        tu += itmp[i]
        pu += iprod[i]
        u1 += n1_a[i]
        u2 += n2_a[i]
        u3 += n3_a[i]

    it = np.zeros((nit, 13), dtype=np.int32)
    it[:, 0] = eoff_a
    it[:, 1] = dk_a
    it[:, 2] = db_a
    it[:, 3] = koffs[mk_a]
    it[:, 4] = dy_a
    it[:, 5] = boffs[mb_a]
    it[:, 6] = dx_a
    it[:, 7] = nl_a
    it[:, 8] = nk_a
    it[:, 9] = nx_a
    it[:, 10] = ny_a
    it[:, 11] = tb_a
    it[:, 12] = pb_a

    # entries flat, in item order (cum3 counts iprod tiles per entry)
    ne = int(nent_a.sum())
    ef = np.zeros((ne, 4), dtype=np.int32)
    coef = np.zeros(ne, dtype=np.complex128 if iscpx else np.float64)
    k = 0
    for i, x in enumerate(items):
        qrb = x[8]
        for (osym, cf) in x[7]:
            go, jo = meta_out.sym_pos[osym]
            ooff, odx, ody = meta_out.sectors[go][qrb]
            ef[k, 0] = i
            ef[k, 1] = ooff + jo * odx * ody
            ef[k, 2] = odx
            ef[k, 3] = ody
            coef[k] = cf
            k += 1
    cum3 = np.concatenate(
        [[0], np.cumsum(np.repeat(iprod, nent_a))]).astype(np.int32)

    ng = _quant(len(gfirst1))
    gfirst1 += [int(c1[-1])] * (ng - len(gfirst1))
    gfirst2 += [int(c2[-1])] * (ng - len(gfirst2))
    gfirst3 += [int(c3[-1])] * (ng - len(gfirst3))

    plan = BlockingV2Plan()
    plan.meta_out = meta_out
    # quantize item/entry counts: the jit signature depends on the it /
    # ef / cum shapes, so exact per-site sizes would compile one kernel
    # per site per sweep-schedule change.  Padded items/entries span zero
    # tasks (repeated cum tail) and are never selected by searchsorted.
    nit_q = _quant(nit)
    it = np.concatenate(
        [it, np.zeros((nit_q - nit, 13), dtype=it.dtype)])
    it[nit:, 7:11] = 1
    c1 = np.concatenate([c1, np.full(nit_q - nit, c1[-1], c1.dtype)])
    c2 = np.concatenate([c2, np.full(nit_q - nit, c2[-1], c2.dtype)])
    ne_q = _quant(ne)
    ef = np.concatenate([ef, np.zeros((ne_q - ne, 4), dtype=ef.dtype)])
    ef[ne:, 3] = 1
    coef = np.concatenate([coef, np.zeros(ne_q - ne, dtype=coef.dtype)])
    cum3 = np.concatenate(
        [cum3, np.full(ne_q - ne, cum3[-1], cum3.dtype)])

    plan.T = T
    plan.B = B
    plan.nt1 = nt1
    plan.ntp = ntp
    plan.ncap = _cap_class(meta_out.total + 1)
    plan.left = left
    plan.it = it
    plan.ef = ef
    plan.coef = coef
    plan.cum1 = c1.astype(np.int32)
    plan.cum2 = c2.astype(np.int32)
    plan.cum3 = cum3
    plan.g1 = np.asarray(gfirst1, dtype=np.int32)
    plan.g2 = np.asarray(gfirst2, dtype=np.int32)
    plan.g3 = np.asarray(gfirst3, dtype=np.int32)
    plan.bra_pool = (bra_mats, boffs)
    plan.ket_pool = (ket_mats, koffs)
    plan.flops = float(2 * (db_a * dk_a * dy_a
                            + db_a * dx_a * dy_a).sum())
    plan._dev = None
    plan._src = (bra_T, ket_T)
    return plan


def execute_blocking_v2(plan: BlockingV2Plan, epool_dev,
                        dtype=np.float32, mesh=None, axis: str = "op"):
    """Run the plan on a device input pool; returns the output pool
    [ncap] on device (slot >= meta_out.total stay zero: the sentinel
    convention downstream tile gathers rely on).  With `mesh`, the
    task-group axis is sharded over the mesh axis and partial output
    pools are psum'd."""
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
               jnp.asarray(plan.it), jnp.asarray(plan.ef),
               jnp.asarray(cf.astype(dtype)), jnp.asarray(plan.cum1),
               jnp.asarray(plan.cum2), jnp.asarray(plan.cum3),
               jnp.asarray(plan.g1), jnp.asarray(plan.g2),
               jnp.asarray(plan.g3))
        plan._dev = dev
    (_dt, bpool, kpool, it, ef, coef, cum1, cum2, cum3,
     g1, g2, g3) = dev
    if mesh is not None:
        nd = mesh.shape[axis]
        ng = -(-len(plan.g1) // nd) * nd
        pad = ng - len(plan.g1)
        if pad:
            g1 = jnp.concatenate(
                [g1, jnp.full(pad, plan.cum1[-1], g1.dtype)])
            g2 = jnp.concatenate(
                [g2, jnp.full(pad, plan.cum2[-1], g2.dtype)])
            g3 = jnp.concatenate(
                [g3, jnp.full(pad, plan.cum3[-1], g3.dtype)])
        return _blk_exec_sharded(
            epool_dev, bpool, kpool, it, ef, coef, cum1, cum2, cum3,
            g1, g2, g3, plan.nt1, plan.ntp, plan.T, plan.B, plan.left,
            plan.ncap, ng, mesh, axis)
    return _blk_exec(epool_dev, bpool, kpool, it, ef, coef, cum1, cum2,
                     cum3, g1, g2, g3, plan.nt1, plan.ntp, plan.T,
                     plan.B, plan.left, plan.ncap, len(plan.g1))
