"""Blocking v3 (rotate-once + MXU symbol-mix GEMM, ops/blockv2.py
BlockingV3Plan) parity against the host reference contraction and the
v2 scatter path, both directions, plus end-to-end DMRG through the
tiled engine with the GEMM route enabled (the default)."""

import numpy as np

from block2_preview_tpu.driver.core import DMRGDriver, SymmetryTypes
from block2_preview_tpu.dmrg.environment import MovingEnvironment
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.ops.blockv2 import (BlockingV3Plan,
                                            build_blocking_v2,
                                            execute_blocking_v2,
                                            execute_blocking_v3)

from test_blockv2 import DATA, _check, _pool, _setup


def test_blockv3_left_parity():
    import jax.numpy as jnp
    mpo, mps = _setup()
    me = MovingEnvironment(mpo, mps)
    me.init_environments()
    g = mpo.group
    for t in range(0, 5):
        meta, pp = _pool(me.left_envs[t], mpo, t)
        args = (meta, mpo.tensors[t], mpo.site_quanta[t],
                me.bra.tensors[t], me.ket.tensors[t], g, "left",
                mpo.bond_dqs[t], mpo.bond_dqs[t + 1])
        plan = build_blocking_v2(*args, gemm_mix=True)
        assert isinstance(plan, BlockingV3Plan)
        out = np.asarray(execute_blocking_v3(plan, jnp.asarray(pp),
                                             dtype=np.float64))
        _check(plan.meta_out.unpack(out, g, None), me._left_contract(t))
        # bit-level agreement of layouts with the v2 path
        p2 = build_blocking_v2(*args)
        assert plan.meta_out.signature() == p2.meta_out.signature()
        out2 = np.asarray(execute_blocking_v2(p2, jnp.asarray(pp),
                                              dtype=np.float64))
        assert out.shape == out2.shape
        err = np.abs(out - out2).max()
        assert err <= 1e-11 * max(np.abs(out2).max(), 1.0), (t, err)
        me.update_left(t)


def test_blockv3_right_parity():
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
                                 mpo.bond_dqs[t + 1], mpo.bond_dqs[t],
                                 gemm_mix=True)
        out = np.asarray(execute_blocking_v3(plan, jnp.asarray(pp),
                                             dtype=np.float64))
        _check(plan.meta_out.unpack(out, g, None),
               me._right_contract(t))


def test_blockv3_dmrg_end_to_end():
    """Full jax_tiled DMRG with the v3 GEMM blocking matches numpy."""
    drv = DMRGDriver(symm_type=SymmetryTypes.SZ)
    fd = drv.read_fcidump(f"{DATA}/HUBBARD-L8.FCIDUMP")
    mpo = drv.get_qc_mpo(fcidump=fd)
    D, ns = 60, 5
    mps_a = drv.get_random_mps(D, target=drv.target, seed=3)
    mps_b = drv.get_random_mps(D, target=drv.target, seed=3)
    e_ref = DMRG(mpo, mps_a, backend="numpy", iprint=0).solve(
        [D] * ns, [1e-5] * ns + [0], [1e-10], n_sweeps=ns, tol=0)
    s = DMRG(mpo, mps_b, backend="jax_tiled", dtype=np.float64, iprint=0)
    e = s.solve([D] * ns, [1e-5] * ns + [0], [1e-10], n_sweeps=ns, tol=0)
    assert abs(e - e_ref) < 1e-8, (e, e_ref)
