"""Blocking v2 (ops/blockv2.py): in-kernel task derivation parity against
the host reference contraction, both directions, plus multi-group forcing
and end-to-end DMRG through the jax_tiled backend (whose stacked blocking
now routes to v2)."""

import numpy as np
import pytest

from block2_preview_tpu.driver.core import DMRGDriver, SymmetryTypes
from block2_preview_tpu.dmrg.environment import MovingEnvironment
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.ops.blockv2 import (build_blocking_v2,
                                            execute_blocking_v2)
from block2_preview_tpu.ops.stacked import _cap_class, meta_from_env

DATA = "/root/reference/data"


def _setup(D=40, n_sweeps=2):
    drv = DMRGDriver(symm_type=SymmetryTypes.SZ)
    fd = drv.read_fcidump(f"{DATA}/HUBBARD-L8.FCIDUMP")
    mpo = drv.get_qc_mpo(fcidump=fd)
    mps = drv.get_random_mps(D, target=drv.target)
    s = DMRG(mpo, mps, iprint=0)
    s.solve([D] * n_sweeps, [1e-4] * n_sweeps, [1e-8],
            n_sweeps=n_sweeps, tol=0)
    return mpo, mps


def _pool(env, mpo, bond, dtype=np.float64):
    meta = meta_from_env(env, mpo.bond_dqs[bond])
    pool = meta.pack(env, dtype=dtype)
    pp = np.zeros(_cap_class(len(pool) + 1), dtype=dtype)
    pp[:len(pool)] = pool
    return meta, pp


def _check(got, ref, atol=1e-12):
    """Every reference block must appear in the unpacked output; blocks
    the unpack drops must be zero in the reference."""
    n = 0
    for o, bm in ref.items():
        for (qb, qk), blk in bm.blocks.items():
            g2 = got.get(o)
            g2 = None if g2 is None else g2.blocks.get((qb, qk))
            if g2 is None:
                assert np.abs(blk).max() < atol, (o, qb, qk)
                continue
            err = np.abs(g2 - blk).max() / max(np.abs(blk).max(), 1e-30)
            assert err < 1e-10, (o, qb, qk, err)
            n += 1
    assert n > 0


def test_blockv2_left_parity():
    import jax.numpy as jnp
    mpo, mps = _setup()
    me = MovingEnvironment(mpo, mps)
    me.init_environments()
    g = mpo.group
    for t in range(0, 5):
        meta, pp = _pool(me.left_envs[t], mpo, t)
        plan = build_blocking_v2(meta, mpo.tensors[t],
                                 mpo.site_quanta[t], me.bra.tensors[t],
                                 me.ket.tensors[t], g, "left",
                                 mpo.bond_dqs[t], mpo.bond_dqs[t + 1])
        out = np.asarray(execute_blocking_v2(plan, jnp.asarray(pp),
                                             dtype=np.float64))
        _check(plan.meta_out.unpack(out, g, None), me._left_contract(t))
        me.update_left(t)


def test_blockv2_right_parity():
    import jax.numpy as jnp
    mpo, mps = _setup()
    me = MovingEnvironment(mpo, mps)
    me.init_environments()
    g = mpo.group
    for t in range(mpo.n_sites - 1, 1, -1):
        meta, pp = _pool(me.right_envs[t + 1], mpo, t + 1)
        plan = build_blocking_v2(meta, mpo.tensors[t],
                                 mpo.site_quanta[t], me.bra.tensors[t],
                                 me.ket.tensors[t], g, "right",
                                 mpo.bond_dqs[t + 1], mpo.bond_dqs[t])
        out = np.asarray(execute_blocking_v2(plan, jnp.asarray(pp),
                                             dtype=np.float64))
        _check(plan.meta_out.unpack(out, g, None),
               me._right_contract(t))


def test_blockv2_multigroup(monkeypatch):
    """Short groups must not read into successors' task ranges (same
    regression class as MatvecV2: per-scan-step group masking)."""
    import jax.numpy as jnp

    import block2_preview_tpu.ops.blockv2 as bv2
    mpo, mps = _setup(D=24)
    me = MovingEnvironment(mpo, mps)
    me.init_environments()
    g = mpo.group
    t = mpo.n_sites // 2
    for s in range(t):
        me.update_left(s)
    meta, pp = _pool(me.left_envs[t], mpo, t)
    args = (meta, mpo.tensors[t], mpo.site_quanta[t], me.bra.tensors[t],
            me.ket.tensors[t], g, "left", mpo.bond_dqs[t],
            mpo.bond_dqs[t + 1])
    p0 = build_blocking_v2(*args, T=16)
    f = p0.it.astype(np.int64)
    nl, nk, nx, ny = f[:, 7], f[:, 8], f[:, 9], f[:, 10]
    nent = np.diff(np.searchsorted(p0.ef[:, 0],
                                   np.arange(len(f) + 1)))
    need = int(max((nl * ny * nk).max(), (nx * ny * nl).max(),
                   (nx * ny * nent).max()))
    monkeypatch.setitem(bv2._CFG, 16,
                        (need, int((nl * ny).max()), int((nx * ny).max())))
    plan = build_blocking_v2(*args, T=16)
    assert len(plan.g1) > 2, "budgets did not force multiple groups"
    out = np.asarray(execute_blocking_v2(plan, jnp.asarray(pp),
                                         dtype=np.float64))
    _check(plan.meta_out.unpack(out, g, None), me._left_contract(t))


def test_blockv2_dmrg_end_to_end():
    """Full jax_tiled DMRG (blocking now routed to v2) matches numpy."""
    drv = DMRGDriver(symm_type=SymmetryTypes.SZ)
    fd = drv.read_fcidump(f"{DATA}/HUBBARD-L8.FCIDUMP")
    mpo = drv.get_qc_mpo(fcidump=fd)
    D, ns = 60, 5
    mps_a = drv.get_random_mps(D, target=drv.target, seed=3)
    mps_b = drv.get_random_mps(D, target=drv.target, seed=3)
    e_ref = DMRG(mpo, mps_a, backend="numpy", iprint=0).solve(
        [D] * ns, [1e-5] * ns + [0], [1e-10], n_sweeps=ns, tol=0)
    s = DMRG(mpo, mps_b, backend="jax_tiled", dtype=np.float64, iprint=0)
    assert s.me.stk_engine == "tiled"
    e = s.solve([D] * ns, [1e-5] * ns + [0], [1e-10], n_sweeps=ns, tol=0)
    assert abs(e - e_ref) < 1e-8, (e, e_ref)
