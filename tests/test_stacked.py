"""Symbol-stacked device blocking vs the reference numpy executor
(ops/stacked.py — the TPU-native slab layout replacing per-block BatchGEMM,
reference src/core/batch_gemm.hpp, tensor_functions.hpp:2842)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.environment import MovingEnvironment
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.ops.blocking_plan import build_plan, execute_plan_numpy
from block2_preview_tpu.ops.stacked import (_cap_class, build_stacked_plan,
                                            execute_stacked, meta_from_env)


def _setup(L=8, D=80):
    fd = FCIDUMP.parse(f"/root/reference/data/HUBBARD-L{L}.FCIDUMP")
    mpo = build_mpo(qc_term_table(fd), const_e=fd.const_e)
    info = MPSInfo(mpo.group, mpo.site_quanta,
                   (fd.n_elec, fd.twos, fd.ipg), D)
    mps = MPS.random(info)
    me = MovingEnvironment(mpo, mps)
    me.init_environments()
    return mpo, mps, me


def _cmp(o1, o2):
    err = 0.0
    for s in o1:
        for k, m in o1[s].blocks.items():
            m2 = o2.get(s)
            m2 = m2.blocks.get(k) if m2 else None
            if m2 is None:
                if np.abs(m).max() > 1e-12:
                    err = max(err, float(np.abs(m).max()))
            else:
                err = max(err, float(np.abs(m - m2).max()))
    return err


def test_stacked_left_chain():
    mpo, mps, me = _setup()
    g = mpo.group
    env = me.left_envs[0]
    for t in range(4):
        meta = meta_from_env(env, mpo.bond_dqs[t])
        pool = meta.pack(env)
        pp = np.zeros(_cap_class(len(pool)))
        pp[:len(pool)] = pool
        plan = build_stacked_plan(meta, mpo.tensors[t], mpo.site_quanta[t],
                                  mps.tensors[t], mps.tensors[t], g, "left",
                                  mpo.bond_dqs[t], mpo.bond_dqs[t + 1])
        o2 = plan.meta_out.unpack(
            np.asarray(execute_stacked(plan, jnp.asarray(pp))), g,
            mpo.bond_dqs[t + 1])
        plan_ref = build_plan(env, mpo.tensors[t], mpo.site_quanta[t],
                              mps.tensors[t], mps.tensors[t],
                              mpo.bond_dqs[t + 1], g, "left")
        o1 = execute_plan_numpy(plan_ref, env, mps.tensors[t],
                                mps.tensors[t], g)
        assert _cmp(o1, o2) < 1e-11, t
        env = o1


def test_stacked_right_chain():
    mpo, mps, me = _setup()
    g = mpo.group
    L = mpo.n_sites
    env = me.right_envs[L]

    def comp(t):
        return [g.sub(mpo.bond_dqs[-1][0], dq) for dq in mpo.bond_dqs[t]]

    for t in range(L - 1, L - 5, -1):
        meta = meta_from_env(env, mpo.bond_dqs[t + 1])
        pool = meta.pack(env)
        pp = np.zeros(_cap_class(len(pool)))
        pp[:len(pool)] = pool
        plan = build_stacked_plan(meta, mpo.tensors[t], mpo.site_quanta[t],
                                  mps.tensors[t], mps.tensors[t], g, "right",
                                  mpo.bond_dqs[t + 1], mpo.bond_dqs[t])
        o2 = plan.meta_out.unpack(
            np.asarray(execute_stacked(plan, jnp.asarray(pp))), g,
            mpo.bond_dqs[t])
        plan_ref = build_plan(env, mpo.tensors[t], mpo.site_quanta[t],
                              mps.tensors[t], mps.tensors[t], comp(t), g,
                              "right")
        o1 = execute_plan_numpy(plan_ref, env, mps.tensors[t],
                                mps.tensors[t], g)
        assert _cmp(o1, o2) < 1e-11, t
        env = o1


def test_stacked_backend_dmrg():
    """Full DMRG with device-resident stacked environments matches the
    host engine's energy (Hubbard L8)."""
    from block2_preview_tpu.dmrg.sweep import DMRG
    fd = FCIDUMP.parse("/root/reference/data/HUBBARD-L8.FCIDUMP")
    mpo = build_mpo(qc_term_table(fd), const_e=fd.const_e)
    tgt = (fd.n_elec, fd.twos, fd.ipg)
    mps = MPS.random(MPSInfo(mpo.group, mpo.site_quanta, tgt, 100))
    d = DMRG(mpo, mps, backend="jax_stacked", iprint=0)
    e = d.solve([100], [1e-5, 0.0], [1e-10], n_sweeps=8, tol=1e-10)
    e = float(d.energies[-1][0])
    mps2 = MPS.random(MPSInfo(mpo.group, mpo.site_quanta, tgt, 100))
    d2 = DMRG(mpo, mps2, iprint=0)
    d2.solve([100], [1e-5, 0.0], [1e-10], n_sweeps=8, tol=1e-10)
    e2 = float(d2.energies[-1][0])
    assert abs(e - e2) < 1e-9, (e, e2)
