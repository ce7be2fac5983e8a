"""Compressed integral storage (reference integral_compressed.hpp)."""

import numpy as np

from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP, CompressedFCIDUMP
from block2_preview_tpu.utils.ed import ground_state_energy


def test_compressed_fcidump_roundtrip_and_energy():
    fd = FCIDUMP.parse("/root/reference/data/N2.STO3G.FCIDUMP")
    tol = 1e-9
    cfd = CompressedFCIDUMP.compress(fd, tol=tol)
    err = np.max(np.abs(cfd.g2e - fd.g2e))
    assert err <= tol * 1.01
    assert cfd.compressed_bytes < 0.6 * fd.g2e.nbytes
    # usable transparently by downstream consumers
    fd2 = FCIDUMP.hubbard(6, t=1.0, u=2.0)
    cfd2 = CompressedFCIDUMP.compress(fd2, tol=1e-12)
    e1 = ground_state_energy(qc_term_table(fd2), fd2.n_elec, fd2.twos)[0]
    e2 = ground_state_energy(qc_term_table(cfd2), fd2.n_elec,
                             fd2.twos)[0]
    assert abs(e1 - e2) < 1e-8
    cfd.drop_cache()
    assert np.max(np.abs(cfd.g2e - fd.g2e)) <= tol * 1.01
