"""Device-side perturbative noise (ops/resident.py NoisePlan) parity
against the host noise density matrix (dmrg/sweep.py _average_rho_*;
reference src/dmrg/effective_hamiltonian.hpp:253 perturbative_noise)."""

import numpy as np

from block2_preview_tpu.dmrg.sweep import (_apply_noise,
                                           _average_rho_backward,
                                           _average_rho_forward)
from block2_preview_tpu.ops.resident import NoisePlan
from block2_preview_tpu.ops.tilev2 import MatvecV2

from test_resident import _mix_pools, _setup


def _cmp(rho_h, rho_d):
    assert set(rho_h) == set(rho_d)
    for q in rho_h:
        assert np.allclose(rho_h[q], rho_d[q], atol=1e-10), q


def test_device_noise_forward_backward_parity():
    import jax.numpy as jnp
    mpo, mps = _setup()
    t = mpo.n_sites // 2 - 1
    eff, pl, pr, lw_pool, rw_pool = _mix_pools(mpo, mps, t)
    ex = MatvecV2(eff.ket_space, pl.meta_out, pr.meta_out, mpo.group,
                  eff.target, dtype=np.float64)
    rng = np.random.RandomState(5)
    x = rng.standard_normal(eff.size)
    x /= np.linalg.norm(x)
    psi = eff.unflatten(x)
    noise = 1e-3
    xp = jnp.asarray(ex.pad(x))

    # forward (LW side)
    rho_h = _average_rho_forward(eff, [psi], [1.0], noise)
    plan = NoisePlan(eff.ket_space, pl.meta_out, mpo.group, "lw",
                     ex.struct["T"], ex.struct["psi_idx"])
    rho_n = plan.unpack(np.asarray(
        plan.rho_device(xp, jnp.asarray(lw_pool))))
    rho_d = _apply_noise(
        _average_rho_forward(eff, [psi], [1.0], 0.0), rho_n, noise)
    _cmp(rho_h, rho_d)

    # backward (RW side, transposed psi gather built by the plan)
    rho_hb = _average_rho_backward(eff, [psi], [1.0], noise)
    planb = NoisePlan(eff.ket_space, pr.meta_out, mpo.group, "rw",
                      ex.struct["T"], None)
    rho_nb = planb.unpack(np.asarray(
        planb.rho_device(xp, jnp.asarray(rw_pool))))
    rho_db = _apply_noise(
        _average_rho_backward(eff, [psi], [1.0], 0.0), rho_nb, noise)
    _cmp(rho_hb, rho_db)


def test_resident_dmrg_with_device_noise():
    """End-to-end: jax_resident DMRG with noisy warmup sweeps reaches
    the same energy as the host engine (the noise path goes through
    ResidentSite.noise_rho)."""
    from block2_preview_tpu.core.fcidump import FCIDUMP
    from block2_preview_tpu.core.expr import qc_term_table
    from block2_preview_tpu.dmrg.mpo_builder import build_mpo
    from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
    from block2_preview_tpu.dmrg.sweep import DMRG

    from block2_preview_tpu.utils.ed import ground_state_energy

    fd = FCIDUMP.parse("/root/reference/data/HUBBARD-L8.FCIDUMP")
    tt = qc_term_table(fd)
    mpo = build_mpo(tt, const_e=fd.const_e)
    info = MPSInfo(mpo.group, mpo.site_quanta,
                   (fd.n_elec, fd.twos, fd.ipg), 100)
    mps = MPS.random(info)
    dmrg = DMRG(mpo, mps, backend="jax_resident", dtype=np.float64,
                iprint=0)
    # force the resident path for the tiny test sizes
    import os
    os.environ["B2TPU_RES_MIN_SIZE"] = "1"
    try:
        e = dmrg.solve([100] * 4, [1e-4, 1e-5, 0, 0], [1e-9],
                       n_sweeps=4, tol=0)
    finally:
        del os.environ["B2TPU_RES_MIN_SIZE"]
    e_ed = ground_state_energy(tt, fd.n_elec, fd.twos, fd.const_e)[0]
    assert abs(e - e_ed) < 1e-8, (e, e_ed)
