"""WickGraph-style term factorization (reference src/ic/wick.hpp:2692
WickGraph): common binary sub-contractions across Wick-generated terms
are memoized in a ContractionCache.  Anchors: factored evaluation is
bit-compatible with the plain per-term einsum path, and the cache is
actually exercised (hit count dominates on real equation sets)."""

import numpy as np

from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.ic.wick import (ContractionCache,
                                        _factored_einsum)


def _rand_fd(L=3, nel=2, seed=0):
    # well-gapped one-body part: random decks can have near-degenerate
    # HF levels -> huge t2 amplitudes that amplify fp-ordering noise
    rng = np.random.RandomState(seed)
    h1 = rng.standard_normal((L, L)) * 0.1
    h1 = (h1 + h1.T) / 2 + np.diag(np.arange(L, dtype=float))
    g = rng.standard_normal((L,) * 4) * 0.1
    g = g + g.transpose(1, 0, 2, 3) + g.transpose(0, 1, 3, 2) \
        + g.transpose(1, 0, 3, 2)
    g = g + g.transpose(2, 3, 0, 1)
    return FCIDUMP(n_sites=L, n_elec=nel, twos=0,
                   orb_sym=np.zeros(L, dtype=np.int64), h1e=h1, g2e=g)


def test_factored_einsum_matches_einsum():
    rng = np.random.RandomState(3)
    cases = [
        (["ab", "bc"], "ac"),
        (["ab", "cd"], "abcd"),          # outer product
        (["ab", "ab"], ""),              # full contraction
        (["abc", "bd", "cd"], "a"),      # chain with hyper index
        (["aab", "bc"], "c"),            # internal trace
        (["ab"], "ab"),
        (["abc"], "a"),                  # lone axes summed
    ]
    cache = ContractionCache()
    for specs, out in cases:
        dims = {}
        arrays, keys = [], []
        for k, s in enumerate(specs):
            shape = tuple(dims.setdefault(c, rng.randint(2, 5))
                          for c in s)
            arrays.append(rng.standard_normal(shape))
            keys.append((("leaf", f"x{k}{s}{out}", ()), False))
        ref = np.einsum(",".join(specs) + "->" + out, *arrays)
        got = _factored_einsum(specs, arrays, keys, out, cache)
        assert np.allclose(got, ref, atol=1e-12), (specs, out)


def test_wick_cc_factored_parity_and_hits():
    import block2_preview_tpu.cc.wick_cc as wc
    fd = _rand_fd()
    cc = wc.WickCC(fd)
    m1, _ = cc.eom_ee_matrix()
    assert cc.graph.hits > cc.graph.misses   # factorization dominates
    cc2 = wc.WickCC(fd)
    cc2._ev = lambda expr, t, sp, free: wc.evaluate_tensor(
        expr, t, sp, free)                   # plain per-term einsum
    m2, _ = cc2.eom_ee_matrix()
    scale = max(1.0, np.abs(m2).max())
    assert np.abs(m1 - m2).max() < 1e-11 * scale
    # Lambda + response RDMs run through the same cache
    dm1 = cc.rdm1()
    dm1_ref = cc2.rdm1()
    assert np.abs(dm1 - dm1_ref).max() < 1e-10
