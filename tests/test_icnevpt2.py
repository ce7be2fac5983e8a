"""Fully internally contracted NEVPT2 (Dyall) / MRREPT2 (Fink)
(reference pyblock2/icmr/icnevpt2_full.py, icmrrept2_full.py).

Anchors: ncas=0 reduces exactly to MP2 for both H0s; a single-
determinant CAS makes the IC basis span the uncontracted space so E2
equals the exact uncontracted result (uc/nevpt2.mrpt2_energy)."""

import numpy as np
import pytest

from block2_preview_tpu.icmr.icnevpt2 import ic_nevpt2_full
from block2_preview_tpu.uc.nevpt2 import mrpt2_energy

import sys
sys.path.insert(0, "/root/repo/tests")
from test_scnevpt2 import _rand_fd  # noqa: E402


@pytest.mark.parametrize("h0", ["dyall", "fink"])
def test_ic_nevpt2_mp2_limit(h0):
    fd = _rand_fd(4, 4, seed=5, u=0.3)
    e2_ic, _, _ = ic_nevpt2_full(fd, 2, 0, h0=h0)
    _, e2_uc = mrpt2_energy(fd, 2, 0, h0=h0)
    assert abs(e2_ic - e2_uc) < 1e-10


@pytest.mark.parametrize("h0", ["dyall", "fink"])
def test_ic_nevpt2_single_det_equals_uncontracted(h0):
    fd = _rand_fd(4, 4, seed=9, u=0.4)
    e2_ic, _, _ = ic_nevpt2_full(fd, 1, 1, h0=h0)
    _, e2_uc = mrpt2_energy(fd, 1, 1, h0=h0)
    assert abs(e2_ic - e2_uc) < 1e-10


def test_ic_nevpt2_correlated_cas():
    """CAS(2 orbitals) at n=4: the IC basis still spans the first-order
    interacting space here, so E2 matches uncontracted NEVPT2; the
    strongly contracted value differs (more contraction)."""
    from block2_preview_tpu.icmr.scnevpt2 import sc_nevpt2
    fd = _rand_fd(4, 4, seed=7)
    e2_ic, e_cas, res = ic_nevpt2_full(fd, 1, 2, h0="dyall")
    _, e2_uc = mrpt2_energy(fd, 1, 2, h0="dyall")
    assert abs(e2_ic - e2_uc) < 1e-8
    sc = sc_nevpt2(fd, 1, 2)
    assert abs(sc.e2 - e2_ic) > 1e-3   # SC is a strict contraction
    assert len(res) == 8
