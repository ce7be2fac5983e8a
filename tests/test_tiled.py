"""Tiled ragged-GEMM executor vs host reference matvec + DMRG parity.

Mirrors the reference BatchGEMM unit tests (unit_test/test_batch_gemm.cpp):
the tiled engine must reproduce the block triple-product exactly (up to
dtype) for every site of a real sweep.
"""

import numpy as np
import pytest

from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.dmrg.effective import EffectiveHamiltonian2
from block2_preview_tpu.models.hubbard import hubbard_fcidump
from block2_preview_tpu.ops.tiled import TiledExecutor


def _setup(nsite=6, u=2.0, bond=60):
    fd = hubbard_fcidump(nsite, t=1.0, u=u)
    tt = qc_term_table(fd)
    mpo = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
    info = MPSInfo(mpo.group, mpo.site_quanta,
                   (fd.n_elec, fd.twos, fd.ipg), bond)
    mps = MPS.random(info, seed=5)
    return fd, mpo, mps


def test_tiled_matvec_matches_reference():
    fd, mpo, mps = _setup()
    dmrg = DMRG(mpo, mps, backend="numpy", iprint=0)
    # run one site update to get a realistic center, then compare matvecs
    dmrg.update_two_dot(0, True, 60, 0.0, 1e-9)
    dmrg.update_two_dot(1, True, 60, 0.0, 1e-9)
    eff = EffectiveHamiltonian2(dmrg.me, 2)
    rng = np.random.RandomState(3)
    x = rng.standard_normal(eff.size)
    ref = eff.matvec_np(x)
    for T in (16, 32):
        ex = TiledExecutor(eff, dtype=np.float64, T=T)
        got = ex.matvec(x)
        assert np.max(np.abs(got - ref)) < 1e-10, f"T={T}"
    # f32 tolerance
    ex = TiledExecutor(eff, dtype=np.float32)
    got = ex.matvec(x)
    scale = np.max(np.abs(ref)) + 1.0
    assert np.max(np.abs(got - ref)) / scale < 1e-5


def test_tiled_structure_cache_reuse():
    fd, mpo, mps = _setup()
    dmrg = DMRG(mpo, mps, backend="numpy", iprint=0)
    dmrg.update_two_dot(0, True, 60, 0.0, 1e-9)
    eff = EffectiveHamiltonian2(dmrg.me, 1)
    cache = {}
    ex1 = TiledExecutor(eff, dtype=np.float64, T=16, cache=cache,
                        cache_key=1)
    ex2 = TiledExecutor(eff, dtype=np.float64, T=16, cache=cache,
                        cache_key=1)
    assert ex1.struct is ex2.struct
    x = np.random.RandomState(0).standard_normal(eff.size)
    assert np.allclose(ex1.matvec(x), ex2.matvec(x))


def test_tiled_dmrg_energy_parity():
    fd, mpo, mps = _setup(nsite=6, bond=80)
    from block2_preview_tpu.utils.ed import ground_state_energy
    eref = ground_state_energy(qc_term_table(fd), fd.n_elec, fd.twos) \
        + fd.const_e
    dmrg = DMRG(mpo, mps, backend="jax_tiled", iprint=0,
                dtype=np.float64)
    e = None
    for sw in range(6):
        fwd = sw % 2 == 0
        res = dmrg.sweep(fwd, bond_dim=80, noise=1e-5 if sw < 2 else 0.0,
                         dav_thrd=1e-9)
        e = float(np.min([np.min(x) for x in res.energies]))
    assert abs(e - eref) < 1e-8


def test_tiled_device_davidson():
    fd, mpo, mps = _setup(nsite=6, bond=60)
    dmrg = DMRG(mpo, mps, backend="numpy", iprint=0)
    dmrg.update_two_dot(0, True, 60, 0.0, 1e-9)
    dmrg.update_two_dot(1, True, 60, 0.0, 1e-9)
    eff = EffectiveHamiltonian2(dmrg.me, 2)
    x0 = eff.flatten(eff.initial_guess())
    x0 /= np.linalg.norm(x0)
    diag = eff.diagonal()
    ex = TiledExecutor(eff, dtype=np.float64, T=16)
    th, xv, it = ex.solve_ground_state(x0, diag, conv_thrd=1e-12,
                                       max_iter=100)
    # compare against host davidson
    from block2_preview_tpu.ops.davidson import davidson
    w, v, _ = davidson(eff.matvec_np, diag, x0[:, None], n_roots=1,
                       conv_thrd=1e-12)
    assert abs(th - w[0]) < 1e-8


def test_tiled_onedot_switch():
    """twodot_to_onedot with the tiled backend (one-dot goes through the
    pluggable solver path too)."""
    fd, mpo, mps = _setup(nsite=6, bond=60)
    from block2_preview_tpu.core.expr import qc_term_table
    from block2_preview_tpu.utils.ed import ground_state_energy
    dmrg = DMRG(mpo, mps, backend="jax_tiled", dtype=np.float64,
                iprint=0)
    e = dmrg.solve([60] * 8, [1e-4, 1e-5] + [0] * 6, [1e-10],
                   n_sweeps=8, tol=1e-12, twodot_to_onedot=4)
    eref = ground_state_energy(qc_term_table(fd), fd.n_elec,
                               fd.twos)[0] + fd.const_e
    assert abs(e - eref) < 1e-5
