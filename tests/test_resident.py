"""Device-resident pipeline (ops/resident.py + ops/tilev2.py) parity:
mix (LW/RW assembly from stacked env pools) and the v2 slab matvec/diag
against the host reference EffectiveHamiltonian2."""

import numpy as np
import pytest

from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.driver.core import DMRGDriver, SymmetryTypes
from block2_preview_tpu.dmrg.effective import EffectiveHamiltonian2
from block2_preview_tpu.dmrg.environment import MovingEnvironment
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.ops.resident import build_mix_plan, execute_mix
from block2_preview_tpu.ops.stacked import meta_from_env
from block2_preview_tpu.ops.tilev2 import MatvecV2

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


def _mix_pools(mpo, mps, t, dtype=np.float64):
    """Host env -> stacked pools -> device mix -> LW/RW pools + metas."""
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
    pool_l = meta_l.pack(env_l, dtype=dtype)
    pool_r = meta_r.pack(env_r, dtype=dtype)

    tk = eff.target
    active_lb = {qL for (qL, _) in eff.bra_space.keys}
    active_rb = {qR for (_, qR) in eff.bra_space.keys}
    pl = build_mix_plan(meta_l, mpo.tensors[t], mpo.site_quanta[t],
                        eff.bra_space.fl, bond_is_first=True,
                        join_on_input=True, group=g,
                        out_bond_dqs=mpo.bond_dqs[t + 1],
                        active=active_lb, fused_ket=eff.ket_space.fl,
                        active_ket={qL for (qL, _) in eff.ket_space.keys})
    pr = build_mix_plan(meta_r, mpo.tensors[t + 1], mpo.site_quanta[t + 1],
                        eff.bra_space.fr, bond_is_first=False,
                        join_on_input=False, group=g,
                        out_bond_dqs=mpo.bond_dqs[t + 1],
                        comp_target=tk, active=active_rb,
                        fused_ket=eff.ket_space.fr, comp_target_ket=tk,
                        active_ket={qR for (_, qR) in eff.ket_space.keys})
    import jax.numpy as jnp
    lw_pool = np.asarray(execute_mix(pl, jnp.asarray(pool_l), dtype=dtype))
    rw_pool = np.asarray(execute_mix(pr, jnp.asarray(pool_r), dtype=dtype))
    return eff, pl, pr, lw_pool, rw_pool


def test_mix_matches_host_assembly():
    mpo, mps = _setup()
    t = mpo.n_sites // 2 - 1
    eff, pl, pr, lw_pool, rw_pool = _mix_pools(mpo, mps, t)
    # compare every LW block against the slab pool content
    for which, meta, pool, ops in (("LW", pl.meta_out, lw_pool, eff.LW),
                                   ("RW", pr.meta_out, rw_pool, eff.RW)):
        n_checked = 0
        for m, d in ops.items():
            gp = meta.sym_pos.get(m)
            assert gp is not None, (which, m)
            gi, j = gp
            for (qb, qk), blk in d.items():
                off, db, dk = meta.sectors[gi][qb]
                got = pool[off + j * db * dk:off + (j + 1) * db * dk]
                assert np.allclose(got.reshape(db, dk), blk, atol=1e-12), \
                    (which, m, qb, qk)
                n_checked += 1
        assert n_checked > 0


def test_matvec_v2_parity():
    mpo, mps = _setup()
    t = mpo.n_sites // 2 - 1
    eff, pl, pr, lw_pool, rw_pool = _mix_pools(mpo, mps, t)
    ex = MatvecV2(eff.ket_space, pl.meta_out, pr.meta_out, mpo.group,
                  eff.target, dtype=np.float64)
    import jax.numpy as jnp
    lw_dev = jnp.asarray(lw_pool)
    rw_dev = jnp.asarray(rw_pool)
    rng = np.random.RandomState(3)
    for _ in range(3):
        x = rng.standard_normal(eff.size)
        ref = eff.matvec_np(x)
        got = np.asarray(ex.matvec_device(jnp.asarray(ex.pad(x)),
                                          lw_dev, rw_dev))[:eff.size]
        err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-30)
        assert err < 1e-10, err


def test_device_davidson_thick_restart():
    """Convergence THROUGH the subspace-compression restart (m > M).
    Regression: the masked Rayleigh-Ritz used a 1e30 sentinel that TPU
    eigh (QDWH) cannot handle — ~0.7 absolute error in the ground Ritz
    value and stalls at the first restart."""
    import jax.numpy as jnp
    from block2_preview_tpu.ops.device_davidson import device_davidson
    rng = np.random.RandomState(0)
    n = 64
    A = rng.standard_normal((n, n))
    A = 0.5 * (A + A.T) - 120 * np.eye(n) \
        + np.diag(rng.standard_normal(n) * 5)
    w_true = np.linalg.eigvalsh(A)[0]
    x0 = rng.standard_normal(n)
    x0 /= np.linalg.norm(x0)
    Aj = jnp.asarray(A)
    th, x, it = device_davidson(lambda v: Aj @ v,
                                jnp.asarray(np.diag(A).copy()),
                                jnp.asarray(x0), conv_thrd=1e-12,
                                max_iter=200, max_subspace=12)
    assert int(it) > 12          # must pass at least one restart
    assert abs(float(th) - w_true) < 1e-9


def test_resident_backend_end_to_end(monkeypatch):
    """Full DMRG solve on the jax_resident backend (device-resident
    env pools -> mix -> v2 matvec -> on-device Davidson) matches the
    host reference energy, with noise enabled (exercises host_ops)."""
    monkeypatch.setenv("B2TPU_RES_MIN_SIZE", "1")
    deck = f"{DATA}/HUBBARD-L8.FCIDUMP"
    D, ns = 80, 6
    drv = DMRGDriver(symm_type=SymmetryTypes.SZ)
    fd = drv.read_fcidump(deck)
    mpo = drv.get_qc_mpo(fcidump=fd)
    mps_a = drv.get_random_mps(D, target=drv.target, seed=7)
    mps_b = drv.get_random_mps(D, target=drv.target, seed=7)
    s_ref = DMRG(mpo, mps_a, backend="numpy", iprint=0)
    e_ref = s_ref.solve([D] * ns, [1e-5] * ns + [0], [1e-10],
                        n_sweeps=ns, tol=0)
    s_res = DMRG(mpo, mps_b, backend="jax_resident", dtype=np.float64,
                 iprint=0)
    e_res = s_res.solve([D] * ns, [1e-5] * ns + [0], [1e-10],
                        n_sweeps=ns, tol=0)
    assert abs(e_res - e_ref) < 1e-8, (e_res, e_ref)


def test_resident_edge_host_parity(monkeypatch):
    """B2TPU_RES_EDGE_HOST=k routes the first/last k two-dot centers to
    the host path (the round-5 site-0 small-signature workaround,
    RESULTS/launch_chunk.json) — energies must be unchanged vs the full
    resident run."""
    monkeypatch.setenv("B2TPU_RES_MIN_SIZE", "1")
    deck = f"{DATA}/HUBBARD-L8.FCIDUMP"
    D, ns = 80, 6
    drv = DMRGDriver(symm_type=SymmetryTypes.SZ)
    fd = drv.read_fcidump(deck)
    mpo = drv.get_qc_mpo(fcidump=fd)
    mps_a = drv.get_random_mps(D, target=drv.target, seed=7)
    mps_b = drv.get_random_mps(D, target=drv.target, seed=7)
    s_ref = DMRG(mpo, mps_a, backend="jax_resident", dtype=np.float64,
                 iprint=0)
    e_ref = s_ref.solve([D] * ns, [1e-5] * ns + [0], [1e-10],
                        n_sweeps=ns, tol=0)
    monkeypatch.setenv("B2TPU_RES_EDGE_HOST", "2")
    s_eh = DMRG(mpo, mps_b, backend="jax_resident", dtype=np.float64,
                iprint=0)
    e_eh = s_eh.solve([D] * ns, [1e-5] * ns + [0], [1e-10],
                      n_sweeps=ns, tol=0)
    assert abs(e_eh - e_ref) < 1e-8, (e_eh, e_ref)


def test_matvec_v2_multigroup_parity(monkeypatch):
    """Regression: a scan step must only process its own group's task
    range.  Groups shorter than B used to read on into the next group's
    tasks — double-counting them and colliding tmp-tile bases (which
    restart at 0 per group).  Forcing tiny stage budgets makes every
    group short and multiplies groups."""
    import jax.numpy as jnp
    import block2_preview_tpu.ops.tilev2 as tv2
    mpo, mps = _setup(D=24)
    t = mpo.n_sites // 2 - 1
    eff, pl, pr, lw_pool, rw_pool = _mix_pools(mpo, mps, t)
    # budget = the largest single item's task count -> (almost) every
    # item lands in its own group, all of them shorter than B
    ex0 = MatvecV2(eff.ket_space, pl.meta_out, pr.meta_out, mpo.group,
                   eff.target, dtype=np.float64, T=16)
    f = ex0.struct["it"].astype(np.int64)
    na, nk, npp, nn = f[:, 8], f[:, 9], f[:, 10], f[:, 11]
    need = int(max((na * nn * nk).max(), (na * nn * npp).max()))
    monkeypatch.setitem(tv2._CFG, 16, (need, max(int((na * nn).max()), 1)))
    ex = MatvecV2(eff.ket_space, pl.meta_out, pr.meta_out, mpo.group,
                  eff.target, dtype=np.float64, T=16)
    assert len(ex.struct["g1"]) > 2, "budgets did not force multiple groups"
    lw_dev = jnp.asarray(lw_pool)
    rw_dev = jnp.asarray(rw_pool)
    rng = np.random.RandomState(11)
    x = rng.standard_normal(eff.size)
    ref = eff.matvec_np(x)
    got = np.asarray(ex.matvec_device(jnp.asarray(ex.pad(x)),
                                      lw_dev, rw_dev))[:eff.size]
    err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-30)
    assert err < 1e-10, err


def test_diag_v2_parity():
    mpo, mps = _setup()
    t = mpo.n_sites // 2 - 1
    eff, pl, pr, lw_pool, rw_pool = _mix_pools(mpo, mps, t)
    ex = MatvecV2(eff.ket_space, pl.meta_out, pr.meta_out, mpo.group,
                  eff.target, dtype=np.float64)
    from block2_preview_tpu.ops.resident import (build_diag_struct,
                                                 execute_diag)
    ds = build_diag_struct(eff.ket_space, pl.meta_out, pr.meta_out,
                           ex.struct["T"], ex.struct["nt2"],
                           ex.struct["sig_idx"])
    assert ds is not None
    import jax.numpy as jnp
    got = np.asarray(execute_diag(ds, jnp.asarray(lw_pool),
                                  jnp.asarray(rw_pool)))[:eff.size]
    ref = eff.diagonal()
    assert np.abs(got - ref).max() < 1e-10
