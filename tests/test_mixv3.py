"""Mix v3 (gather-only GEMM assembly, ops/mixv3.py) parity against the
v2 scatter mix: identical meta_out layouts and numerically identical
LW/RW slab pools on a real post-sweep environment."""

import numpy as np

from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.driver.core import DMRGDriver, SymmetryTypes
from block2_preview_tpu.dmrg.effective import EffectiveHamiltonian2
from block2_preview_tpu.dmrg.environment import MovingEnvironment
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.ops.mixv3 import build_mix_plan_v3, execute_mix_v3
from block2_preview_tpu.ops.resident import build_mix_plan, execute_mix
from block2_preview_tpu.ops.stacked import meta_from_env

DATA = "/root/reference/data"


def _setup(deck=f"{DATA}/HUBBARD-L8.FCIDUMP", D=60, n_sweeps=2):
    drv = DMRGDriver(symm_type=SymmetryTypes.SZ)
    fd = drv.read_fcidump(deck)
    mpo = drv.get_qc_mpo(fcidump=fd)
    mps = drv.get_random_mps(D, target=drv.target)
    s = DMRG(mpo, mps, iprint=0)
    s.solve([D] * n_sweeps, [1e-4] * n_sweeps, [1e-8], n_sweeps=n_sweeps,
            tol=0)
    return mpo, mps


def _plan_args(mpo, mps, t):
    me = MovingEnvironment(mpo, mps)
    me.init_environments()
    for s in range(t):
        me.update_left(s)
    eff = EffectiveHamiltonian2(me, t)
    g = mpo.group
    env_l = me.left_envs[t]
    env_r = me.right_envs[t + 2]
    meta_l = meta_from_env(env_l, mpo.bond_dqs[t])
    meta_r = meta_from_env(env_r, mpo.bond_dqs[t + 2])
    pool_l = meta_l.pack(env_l, dtype=np.float64)
    pool_r = meta_r.pack(env_r, dtype=np.float64)
    tk = eff.target
    kw_l = dict(bond_is_first=True, join_on_input=True, group=g,
                out_bond_dqs=mpo.bond_dqs[t + 1],
                active={qL for (qL, _) in eff.bra_space.keys},
                fused_ket=eff.ket_space.fl,
                active_ket={qL for (qL, _) in eff.ket_space.keys})
    kw_r = dict(bond_is_first=False, join_on_input=False, group=g,
                out_bond_dqs=mpo.bond_dqs[t + 1], comp_target=tk,
                active={qR for (_, qR) in eff.bra_space.keys},
                fused_ket=eff.ket_space.fr, comp_target_ket=tk,
                active_ket={qR for (_, qR) in eff.ket_space.keys})
    args_l = (meta_l, mpo.tensors[t], mpo.site_quanta[t], eff.bra_space.fl)
    args_r = (meta_r, mpo.tensors[t + 1], mpo.site_quanta[t + 1],
              eff.bra_space.fr)
    return args_l, kw_l, pool_l, args_r, kw_r, pool_r


def test_mixv3_matches_v2():
    import jax.numpy as jnp
    mpo, mps = _setup()
    for t in (0, mpo.n_sites // 2 - 1, mpo.n_sites - 3):
        args_l, kw_l, pool_l, args_r, kw_r, pool_r = _plan_args(
            mpo, mps, t)
        for args, kw, pool in ((args_l, kw_l, pool_l),
                               (args_r, kw_r, pool_r)):
            p2 = build_mix_plan(*args, **kw)
            p3 = build_mix_plan_v3(*args, **kw)
            assert (p2 is None) == (p3 is None)
            if p2 is None:
                continue
            # identical output layout (consumers hash/key on it)
            assert p3.meta_out.signature() == p2.meta_out.signature()
            assert p3.ncap_out == p2.ncap_out
            dev = jnp.asarray(pool)
            s2 = np.asarray(execute_mix(p2, dev, dtype=np.float64))
            s3 = np.asarray(execute_mix_v3(p3, dev, dtype=np.float64))
            assert s3.shape == s2.shape
            err = np.abs(s3 - s2).max()
            scale = max(np.abs(s2).max(), 1.0)
            assert err <= 1e-12 * scale, (t, kw.get("comp_target"), err)


def test_mixv3_f32():
    import jax.numpy as jnp
    mpo, mps = _setup(D=40, n_sweeps=1)
    t = mpo.n_sites // 2 - 1
    args_l, kw_l, pool_l, *_ = _plan_args(mpo, mps, t)
    p2 = build_mix_plan(*args_l, **kw_l)
    p3 = build_mix_plan_v3(*args_l, **kw_l)
    dev = jnp.asarray(pool_l.astype(np.float32))
    s2 = np.asarray(execute_mix(p2, dev, dtype=np.float32))
    s3 = np.asarray(execute_mix_v3(p3, dev, dtype=np.float32))
    scale = max(np.abs(s2).max(), 1.0)
    assert np.abs(s3 - s2).max() <= 1e-5 * scale
