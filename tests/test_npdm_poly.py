"""Polynomial pooled-sweep NPDM engine (dmrg/npdm_scheme.py) vs the
exact determinant-space reconstruction (dmrg/npdm.py) — the symbol-free
GeneralNPDMMPO analog (reference src/dmrg/general_npdm.hpp:43,
src/core/spin_permutation.hpp:1703 NPDMCounter)."""

import numpy as np
import pytest

from block2_preview_tpu.dmrg.npdm import npdm_spatial
from block2_preview_tpu.dmrg.npdm_scheme import npdm_spatial_poly
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.driver.core import DMRGDriver, SymmetryTypes

DATA = "/root/reference/data"


def _solved_mps(deck="HUBBARD-L6.FCIDUMP", D=40, seed=1):
    drv = DMRGDriver(symm_type=SymmetryTypes.SZ)
    fd = drv.read_fcidump(f"{DATA}/{deck}")
    mpo = drv.get_qc_mpo(fcidump=fd)
    mps = drv.get_random_mps(D, target=drv.target, seed=seed)
    DMRG(mpo, mps, iprint=0).solve([D] * 4, [1e-4] * 3 + [0], [1e-9],
                                   n_sweeps=4, tol=0)
    return drv, mps


@pytest.mark.parametrize("order", [1, 2, 3])
def test_poly_npdm_matches_determinant(order):
    _drv, mps = _solved_mps()
    ref = npdm_spatial(mps, order)
    got = npdm_spatial_poly(mps, order)
    assert np.abs(got - ref).max() < 1e-10


def test_poly_4pdm_matches_determinant():
    _drv, mps = _solved_mps()
    ref = npdm_spatial(mps, 4)
    got = npdm_spatial_poly(mps, 4)
    assert np.abs(got - ref).max() < 1e-10


def test_poly_transition_npdm():
    # different bra: transition densities exercise the bra != ket path
    drv = DMRGDriver(symm_type=SymmetryTypes.SZ)
    fd = drv.read_fcidump(f"{DATA}/HUBBARD-L6.FCIDUMP")
    mpo = drv.get_qc_mpo(fcidump=fd)
    a = drv.get_random_mps(30, target=drv.target, seed=3)
    b = drv.get_random_mps(30, target=drv.target, seed=7)
    for m in (a, b):
        DMRG(mpo, m, iprint=0).solve([30] * 2, [1e-4, 0], [1e-8],
                                     n_sweeps=2, tol=0)
    ref = npdm_spatial(a, 2, bra=b)
    got = npdm_spatial_poly(a, 2, bra=b)
    assert np.abs(got - ref).max() < 1e-10


def test_driver_dispatch_poly():
    drv, mps = _solved_mps()
    ref = npdm_spatial(mps, 3)
    got = drv.get_npdm(mps, pdm_type=3, algo="poly")
    assert np.abs(got - ref).max() < 1e-10


@pytest.mark.slow
def test_poly_4pdm_l8():
    _drv, mps = _solved_mps(deck="HUBBARD-L8.FCIDUMP", D=50)
    ref = npdm_spatial(mps, 4)
    got = npdm_spatial_poly(mps, 4)
    assert np.abs(got - ref).max() < 1e-10


def test_poly_device_gemm_parity():
    """device=True closes the middle class GEMMs on the accelerator
    (CPU-jax in tests); exact parity with the host BLAS path."""
    from block2_preview_tpu.dmrg.npdm_scheme import pooled_gram
    _drv, mps = _solved_mps()
    g_ref, combos_ref = pooled_gram(mps, 2)
    g_dev, combos_dev = pooled_gram(mps, 2, device=True,
                                    device_min_flop=0.0)
    assert np.array_equal(combos_ref, combos_dev)
    assert np.abs(g_dev - g_ref).max() < 1e-12


def test_poly_mesh_sharded_gemm_parity():
    """Passing a Mesh as `device` shards the combo-row axis of the pool
    matrices over the mesh (distributed PDM sweeps); exact parity."""
    import jax
    from jax.sharding import Mesh
    from block2_preview_tpu.dmrg.npdm_scheme import pooled_gram
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("op",))
    _drv, mps = _solved_mps()
    g_ref, _ = pooled_gram(mps, 2)
    g_dev, _ = pooled_gram(mps, 2, device=mesh, device_min_flop=0.0)
    assert np.abs(g_dev - g_ref).max() < 1e-12
