"""Multi-host layer (parallel/multihost.py; reference
parallel_mpi.hpp:81 MPICommunicator): single-process fallback + the
global-mesh path driving a sharded sweep step on the virtual 8-device
mesh (the multi-host contract is compile-level here — real multi-host
hardware is not available in this image)."""

import numpy as np

from block2_preview_tpu.parallel.multihost import (distributed_spec,
                                                   ensure_distributed,
                                                   global_mesh,
                                                   host_local_slice,
                                                   process_info)


def test_single_process_fallback(monkeypatch):
    monkeypatch.delenv("B2TPU_COORDINATOR", raising=False)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert distributed_spec() is None
    assert ensure_distributed() is False
    pid, np_ = process_info()
    assert pid == 0 and np_ == 1
    assert host_local_slice(10) == slice(0, 10)


def test_spec_parsing(monkeypatch):
    monkeypatch.setenv("B2TPU_COORDINATOR", "10.0.0.1:1234")
    monkeypatch.setenv("B2TPU_NUM_PROCS", "4")
    monkeypatch.setenv("B2TPU_PROC_ID", "2")
    assert distributed_spec() == ("10.0.0.1:1234", 4, 2)


def test_global_mesh_drives_sharded_blocking():
    """global_mesh() (single-process: all local devices) must plug
    straight into the sharded blocking executor with exact parity —
    the same Mesh type a multi-host init would return."""
    import jax
    import jax.numpy as jnp

    from block2_preview_tpu.dmrg.environment import MovingEnvironment
    from block2_preview_tpu.driver.core import (DMRGDriver,
                                                SymmetryTypes)
    from block2_preview_tpu.dmrg.sweep import DMRG
    from block2_preview_tpu.ops.blockv2 import (build_blocking_v2,
                                                execute_blocking_v2)
    from block2_preview_tpu.ops.stacked import _cap_class, meta_from_env

    mesh = global_mesh()
    assert mesh.shape["op"] == len(jax.devices())

    drv = DMRGDriver(symm_type=SymmetryTypes.SZ)
    fd = drv.read_fcidump("/root/reference/data/HUBBARD-L8.FCIDUMP")
    mpo = drv.get_qc_mpo(fcidump=fd)
    mps = drv.get_random_mps(40, target=drv.target)
    DMRG(mpo, mps, iprint=0).solve([40], [1e-4], [1e-8], n_sweeps=1,
                                   tol=0)
    me = MovingEnvironment(mpo, mps)
    me.init_environments()
    t = 2
    for s in range(t):
        me.update_left(s)
    env = me.left_envs[t]
    meta = meta_from_env(env, mpo.bond_dqs[t])
    pool = meta.pack(env, dtype=np.float64)
    pp = np.zeros(_cap_class(len(pool) + 1))
    pp[:len(pool)] = pool
    plan = build_blocking_v2(meta, mpo.tensors[t], mpo.site_quanta[t],
                             me.bra.tensors[t], me.ket.tensors[t],
                             mpo.group, "left", mpo.bond_dqs[t],
                             mpo.bond_dqs[t + 1])
    out1 = np.asarray(execute_blocking_v2(plan, jnp.asarray(pp),
                                          dtype=np.float64))
    out8 = np.asarray(execute_blocking_v2(plan, jnp.asarray(pp),
                                          dtype=np.float64, mesh=mesh))
    assert np.abs(out1 - out8).max() < 1e-11
