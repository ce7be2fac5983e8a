"""Determinant-analysis tests (mirrors reference
unit_test/test_det_n2_sto3g.cpp tier): coefficients vs ED eigenvector."""

import numpy as np
import pytest

from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.determinant import (det_coefficient,
                                                 dominant_determinants,
                                                 sample_determinants)
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.driver.core import DMRGDriver
from block2_preview_tpu.utils.ed import sector_indices, term_table_to_sparse


@pytest.fixture(scope="module")
def gs6():
    drv = DMRGDriver()
    fd = drv.read_fcidump("/root/reference/tests/driver/FCIDUMP")
    mpo = drv.get_qc_mpo(fcidump=fd)
    mps = drv.get_random_mps(150, seed=2)
    DMRG(mpo, mps, iprint=0).solve([150], [1e-4, 1e-5, 0], [1e-10],
                                   n_sweeps=6, tol=1e-11)
    return drv, fd, mps


def test_det_coefficients_vs_ed(gs6):
    drv, fd, mps = gs6
    L = fd.n_sites
    h = term_table_to_sparse(qc_term_table(fd)).toarray()
    ix = sector_indices(L, fd.n_elec, fd.twos)
    w, v = np.linalg.eigh(h[np.ix_(ix, ix)])
    gsv = v[:, 0]
    dets = dominant_determinants(mps, cutoff=0.03)
    assert len(dets) >= 2
    # fix global sign via the largest det
    c0, occ0 = dets[0]
    idx0 = int(sum(p * 4 ** (L - 1 - t) for t, p in enumerate(occ0)))
    k0 = int(np.nonzero(ix == idx0)[0][0])
    sign = np.sign(c0 * gsv[k0])
    for c, occ in dets[:10]:
        flat = int(sum(p * 4 ** (L - 1 - t) for t, p in enumerate(occ)))
        k = np.nonzero(ix == flat)[0]
        assert len(k) == 1
        assert abs(c * sign - gsv[int(k[0])]) < 5e-5
        assert abs(det_coefficient(mps, occ) - c) < 1e-12


def test_sampling_distribution(gs6):
    drv, fd, mps = gs6
    samples = sample_determinants(mps, 200, seed=5)
    dets = dict((occ, c) for c, occ in dominant_determinants(mps, 0.2))
    # the dominant configuration should be the most frequent sample
    from collections import Counter
    counts = Counter(occ for occ, _ in samples)
    top_occ, top_n = counts.most_common(1)[0]
    best = max(dets.items(), key=lambda kv: abs(kv[1]))[0]
    assert top_occ == best
