"""FP compression codec (utils/fp_codec.py) — the fp_codec.hpp analog.

Checks the absolute-error guarantee, lossless mode, complex support, the
CompressedVector wrapper, and MPS checkpoint round-trips through the codec
(reference fp_cps_cutoff workflow: save MPS lossily, reload, energy drifts
by no more than the bound).
"""

import numpy as np
import pytest

from block2_preview_tpu.utils.fp_codec import CompressedVector, FPCodec


@pytest.mark.parametrize("tol", [1e-4, 1e-8, 1e-12])
def test_roundtrip_error_bound(tol):
    rng = np.random.RandomState(0)
    x = rng.standard_normal(10000) * np.exp(rng.uniform(-20, 3, 10000))
    c = FPCodec(tol)
    y = c.decode(c.encode(x))
    assert np.abs(y - x).max() <= tol
    assert c.ratio(x) > 1.0


def test_lossless_mode():
    rng = np.random.RandomState(1)
    x = rng.standard_normal(1000)
    c = FPCodec(0.0)
    assert np.array_equal(c.decode(c.encode(x)), x)


def test_complex_arrays():
    rng = np.random.RandomState(2)
    z = rng.standard_normal(500) + 1j * rng.standard_normal(500)
    c = FPCodec(1e-9)
    assert np.abs(c.decode(c.encode(z)) - z).max() <= 2e-9


def test_shapes_preserved():
    rng = np.random.RandomState(3)
    x = rng.standard_normal((7, 13, 5))
    c = FPCodec(1e-10)
    y = c.decode(c.encode(x))
    assert y.shape == x.shape
    assert np.abs(y - x).max() <= 1e-10


def test_compressed_vector():
    rng = np.random.RandomState(4)
    x = np.sin(np.linspace(0, 10, 50000)) * 1e-3
    cv = CompressedVector(x, tol=1e-10)
    assert cv.nbytes_compressed < x.nbytes
    assert np.abs(cv.to_array() - x).max() <= 1e-10
    assert abs(cv[100] - x[100]) <= 1e-10


def test_mps_checkpoint_with_codec(tmp_path):
    from block2_preview_tpu.core.expr import qc_term_table
    from block2_preview_tpu.dmrg.expect import mpo_expectation
    from block2_preview_tpu.dmrg.mpo_builder import build_mpo
    from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
    from block2_preview_tpu.dmrg.sweep import DMRG
    from block2_preview_tpu.models.hubbard import hubbard_fcidump
    from block2_preview_tpu.utils.io import load_mps, save_mps

    fd = hubbard_fcidump(6, u=2.0)
    tt = qc_term_table(fd)
    mpo = build_mpo(tt, const_e=fd.const_e)
    info = MPSInfo(mpo.group, mpo.site_quanta,
                   (fd.n_elec, fd.twos, fd.ipg), 100)
    mps = MPS.random(info)
    dmrg = DMRG(mpo, mps, iprint=0)
    e = dmrg.solve([100], [1e-5, 0], [1e-9], n_sweeps=6, tol=1e-10)

    p = str(tmp_path / "ket.npz")
    save_mps(mps, p, fp_tol=1e-7)
    m2 = load_mps(p)
    e2 = mpo_expectation(mpo, m2) / (m2.norm() ** 2
                                     if hasattr(m2, "norm") else 1.0)
    assert abs(e2 - e) < 1e-4
