"""Orbital reordering tests (reference tests/driver/test.sh gaopt tier:
MINIMUM f = 1.701655172562)."""

import numpy as np

from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.orbital_ordering import (evaluate, fiedler,
                                                      ga_opt,
                                                      kmat_from_fcidump)


def test_gaopt_matches_block2_objective():
    fd = FCIDUMP.parse("/root/reference/tests/driver/FCIDUMP")
    kmat = kmat_from_fcidump(fd)
    ordn = ga_opt(kmat, n_generations=600, seed=7)
    f = evaluate(kmat, ordn)
    assert abs(f - 1.701655172562) < 1e-6


def test_fiedler_improves_cost():
    fd = FCIDUMP.parse("/root/reference/data/N2.STO3G.FCIDUMP")
    kmat = kmat_from_fcidump(fd)
    f_id = evaluate(kmat, np.arange(fd.n_sites))
    f_fi = evaluate(kmat, fiedler(kmat))
    assert f_fi <= f_id + 1e-12
