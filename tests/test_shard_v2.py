"""Multi-device sharding of the v2 engines (ops/tilev2.py matvec,
ops/blockv2.py blocking) and of a full DMRG sweep: the task-group axis
splits over a mesh axis and partial sigma/output pools are psum'd —
block2's distributed-operator axis (reference
src/dmrg/qc_parallel_rule.hpp:44-80 ownership +
src/core/parallel_tensor_functions.hpp:219 allreduce_sum(vmats)),
with Davidson running rank-redundantly on replicated data
(src/core/iterative_matrix_functions.hpp:1181 pcomm semantics)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from block2_preview_tpu.dmrg.environment import MovingEnvironment
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.driver.core import DMRGDriver, SymmetryTypes
from block2_preview_tpu.ops.blockv2 import (build_blocking_v2,
                                            execute_blocking_v2)
from block2_preview_tpu.ops.stacked import _cap_class, meta_from_env
from block2_preview_tpu.ops.tilev2 import MatvecV2
from block2_preview_tpu.parallel.shard import default_mesh

from test_resident import _mix_pools, _setup

needs_mesh = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


@needs_mesh
def test_sharded_matvec_v2_parity():
    mesh = default_mesh(8)
    mpo, mps = _setup()
    t = mpo.n_sites // 2 - 1
    eff, pl, pr, lw_pool, rw_pool = _mix_pools(mpo, mps, t)
    ex = MatvecV2(eff.ket_space, pl.meta_out, pr.meta_out, mpo.group,
                  eff.target, dtype=np.float64)
    rng = np.random.RandomState(7)
    x = rng.standard_normal(eff.size)
    ref = eff.matvec_np(x)
    xp = jnp.asarray(ex.pad(x))
    lw, rw = jnp.asarray(lw_pool), jnp.asarray(rw_pool)
    got1 = np.asarray(ex.matvec_device(xp, lw, rw))[:eff.size]
    got8 = np.asarray(
        ex.matvec_device_sharded(xp, lw, rw, mesh))[:eff.size]
    scale = np.abs(ref).max()
    assert np.abs(got1 - ref).max() / scale < 1e-10
    assert np.abs(got8 - ref).max() / scale < 1e-10


@needs_mesh
def test_sharded_blocking_v2_parity():
    mesh = default_mesh(8)
    mpo, mps = _setup()
    t = mpo.n_sites // 2 - 1
    me = MovingEnvironment(mpo, mps)
    me.init_environments()
    for s in range(t):
        me.update_left(s)
    env_l = me.left_envs[t]
    meta = meta_from_env(env_l, mpo.bond_dqs[t])
    pool = meta.pack(env_l, dtype=np.float64)
    pp = np.zeros(_cap_class(len(pool) + 1), dtype=np.float64)
    pp[:len(pool)] = pool
    plan = build_blocking_v2(meta, mpo.tensors[t], mpo.site_quanta[t],
                             mps.tensors[t], mps.tensors[t], mpo.group,
                             "left", mpo.bond_dqs[t],
                             mpo.bond_dqs[t + 1])
    o1 = np.asarray(execute_blocking_v2(plan, jnp.asarray(pp),
                                        dtype=np.float64))
    o8 = np.asarray(execute_blocking_v2(plan, jnp.asarray(pp),
                                        dtype=np.float64, mesh=mesh))
    assert np.abs(o1 - o8).max() / max(np.abs(o1).max(), 1e-30) < 1e-12


@needs_mesh
@pytest.mark.slow
def test_sharded_full_dmrg_energy_parity(monkeypatch):
    """A complete jax_resident DMRG solve on the 8-device mesh (sharded
    blocking + sharded in-Davidson matvec) must reproduce the 1-device
    energy exactly (same arithmetic, psum over a deterministic split)."""
    mesh = default_mesh(8)
    monkeypatch.setenv("B2TPU_RES_MIN_SIZE", "1")
    DATA = "/root/reference/data"
    res = {}
    for tag, kw in [("1dev", {}), ("8dev", {"mesh": mesh})]:
        drv = DMRGDriver(symm_type=SymmetryTypes.SZ)
        fd = drv.read_fcidump(f"{DATA}/HUBBARD-L8.FCIDUMP")
        mpo = drv.get_qc_mpo(fcidump=fd)
        D, ns = 60, 5
        mps = drv.get_random_mps(D, target=drv.target, seed=3)
        s = DMRG(mpo, mps, backend="jax_resident", dtype=np.float64,
                 iprint=0, **kw)
        res[tag] = s.solve([D] * ns, [1e-5] * (ns - 1) + [0], [1e-10],
                           n_sweeps=ns, tol=0)
    assert abs(res["8dev"] - res["1dev"]) < 1e-9, res


@needs_mesh
def test_two_level_nesting_energy_parity(monkeypatch):
    """Two-level nesting (reference ParallelRule::split,
    parallel_rule.hpp:358-369): multi-center site groups (level 1) each
    sharding their local solves over their OWN operator sub-mesh
    (level 2; the 8-device mesh splits 2 x 4).  Energy parity vs the
    plain serial solve."""
    from block2_preview_tpu.parallel.multi_center import MultiCenterDMRG
    mesh = default_mesh(8)
    monkeypatch.setenv("B2TPU_RES_MIN_SIZE", "1")
    DATA = "/root/reference/data"
    drv = DMRGDriver(symm_type=SymmetryTypes.SZ)
    fd = drv.read_fcidump(f"{DATA}/HUBBARD-L8.FCIDUMP")
    mpo = drv.get_qc_mpo(fcidump=fd)
    D, ns = 60, 6
    mps0 = drv.get_random_mps(D, target=drv.target, seed=3)
    e_ref = DMRG(mpo, mps0, iprint=0).solve(
        [D] * ns, [1e-4, 1e-5, 1e-5, 0], [1e-10], n_sweeps=ns + 2,
        tol=1e-12)
    mps = drv.get_random_mps(D, target=drv.target, seed=3)
    mc = MultiCenterDMRG(mpo, mps, conn_centers=[4],
                         backend="jax_resident", mesh=mesh)
    assert mc.seg_meshes is not None and len(mc.seg_meshes) == 2
    assert all(len(m.devices.ravel()) == 4 for m in mc.seg_meshes)
    e = mc.solve([D] * ns, [1e-4, 1e-5, 1e-5, 0], [1e-10],
                 n_sweeps=ns + 2, tol=1e-12)
    assert abs(e - e_ref) < 1e-8, (e, e_ref)


@needs_mesh
@pytest.mark.slow
def test_sharded_sweep_representative_shapes(monkeypatch):
    """Sharded-vs-1-device parity at production-like plan shapes
    (VERDICT r2 item 6): N2/STO-3G at D=250 — the same bond dimension
    the reference's CLI decks converge at — through the full
    jax_resident sharded sweep."""
    mesh = default_mesh(8)
    monkeypatch.setenv("B2TPU_RES_MIN_SIZE", "1")
    DATA = "/root/reference/data"
    res = {}
    for tag, kw in [("1dev", {}), ("8dev", {"mesh": mesh})]:
        drv = DMRGDriver(symm_type=SymmetryTypes.SZ)
        fd = drv.read_fcidump(f"{DATA}/N2.STO3G.FCIDUMP")
        mpo = drv.get_qc_mpo(fcidump=fd)
        D, ns = 250, 4
        mps = drv.get_random_mps(D, target=drv.target, seed=3)
        s = DMRG(mpo, mps, backend="jax_resident", dtype=np.float64,
                 iprint=0, **kw)
        res[tag] = s.solve([D] * ns, [1e-4, 1e-5] + [0] * (ns - 2),
                           [1e-10], n_sweeps=ns, tol=0)
    # exact parity: identical arithmetic, deterministic psum split
    assert abs(res["8dev"] - res["1dev"]) < 1e-8, res
    # and the converged energy is the block2 reference value
    assert abs(res["8dev"] - (-107.654122447525)) < 5e-6, res
