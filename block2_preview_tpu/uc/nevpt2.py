"""Uncontracted second-order MRPT (NEVPT2 / REPT2) in determinant space.

TPU-native counterpart of the reference's uncontracted dynamic-correlation
workflows (block2main `nevpt2` / MRCI big-site keywords; reference
src/dmrg/mps.hpp:1494 NEVPTMPSInfo, pyblock2/uc drivers), driven by the
Dyall / Fink zeroth-order Hamiltonians (core/integral_dyall.py).

Both H0 choices conserve the electron count of each orbital subspace
(inactive I, active A, virtual V), so H0 is block diagonal across
subspace-occupation classes and the first-order equation decouples from the
model space:

    (E0 - P H0 P) |psi1> = P H |0>,        E2 = <0| H P |psi1>

with |0> the CASCI root (inactive doubly occupied, virtuals empty) and P the
projector on the orthogonal complement.  Exact (uncontracted) at small
system sizes; anchors: E2 == MP2 when the active space is empty, E2 == 0
when the active space is everything.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from ..core.expr import qc_term_table
from ..core.fcidump import FCIDUMP
from ..core.integral_dyall import dyall_fcidump, fink_fcidump
from ..utils.ed import sector_indices, term_table_to_sparse


def _model_space_mask(L: int, ix: np.ndarray, n_inactive: int,
                      n_active: int) -> np.ndarray:
    """Within sector rows `ix` (product-basis indices, site-major), flag the
    CAS-class states: inactive doubly occupied, virtual empty."""
    # decode site states (base 4, site-major: site 0 is the slowest digit)
    states = np.zeros((len(ix), L), dtype=np.int64)
    rem = ix.copy()
    for t in range(L - 1, -1, -1):
        states[:, t] = rem % 4
        rem //= 4
    ok = np.ones(len(ix), dtype=bool)
    for t in range(n_inactive):
        ok &= states[:, t] == 3
    for t in range(n_inactive + n_active, L):
        ok &= states[:, t] == 0
    return ok


def casci_root(fd: FCIDUMP, n_inactive: int, n_active: int
               ) -> Tuple[float, np.ndarray, np.ndarray, np.ndarray]:
    """(E_casci, c0, sector rows ix, model mask) for the frozen-core CAS."""
    tt = qc_term_table(fd)
    h = term_table_to_sparse(tt)
    ix = sector_indices(fd.n_sites, fd.n_elec, fd.twos)
    mask = _model_space_mask(fd.n_sites, ix, n_inactive, n_active)
    hm = h[np.ix_(ix[mask], ix[mask])].toarray()
    w, v = np.linalg.eigh(hm)
    return float(w[0] + fd.const_e), v[:, 0], ix, mask


def _subspace_counts(L: int, ix: np.ndarray, n_inactive: int,
                     n_active: int) -> Tuple[np.ndarray, np.ndarray]:
    """Per-determinant (inactive hole count, virtual electron count) for
    sector rows `ix` (base-4 site-major product states)."""
    states = np.zeros((len(ix), L), dtype=np.int64)
    rem = ix.copy()
    for t in range(L - 1, -1, -1):
        states[:, t] = rem % 4
        rem //= 4
    nel = np.array([0, 1, 1, 2], dtype=np.int64)[states]
    holes = (2 * n_inactive - nel[:, :n_inactive].sum(axis=1)
             if n_inactive else np.zeros(len(ix), dtype=np.int64))
    parts = (nel[:, n_inactive + n_active:].sum(axis=1)
             if n_inactive + n_active < L
             else np.zeros(len(ix), dtype=np.int64))
    return holes, parts


def mrpt2_energy(fd: FCIDUMP, n_inactive: int, n_active: int,
                 h0: str = "dyall",
                 rdm1_active: Optional[np.ndarray] = None,
                 max_holes: Optional[int] = None,
                 max_parts: Optional[int] = None,
                 pattern: Optional[Tuple[int, int]] = None
                 ) -> Tuple[float, float]:
    """(E_casci, E2) — uncontracted NEVPT2 (h0='dyall') or REPT2
    (h0='fink').

    Perturber-space restrictions (reference block2main nevpt2s /
    nevpt2-<class> keyword family, parser.py MRPT_KEYS): max_holes /
    max_parts cap the inactive-hole and virtual-electron counts of the
    first-order space ("s" variants use 1/1; "sd" = 2/2 = unrestricted
    since H is a two-body operator); pattern=(nc, nv) restricts to one
    excitation class (e.g. nevpt2-ijr -> (2, 1))."""
    L = fd.n_sites
    e0, c0m, ix, mask = casci_root(fd, n_inactive, n_active)

    if h0 == "dyall":
        if rdm1_active is None and n_active > 0:
            # exact CAS 1-RDM for the generalized Fock diagonal
            rdm1_active = _cas_rdm1(fd, n_inactive, n_active, c0m, ix, mask)
        fd0 = dyall_fcidump(fd, n_inactive, n_active,
                            rdm1_active=rdm1_active)
    elif h0 == "fink":
        fd0 = fink_fcidump(fd, n_inactive, n_active)
    else:
        raise ValueError(h0)

    tt = qc_term_table(fd)
    h = term_table_to_sparse(tt)[np.ix_(ix, ix)].tocsr()
    tt0 = qc_term_table(fd0)
    h0m = term_table_to_sparse(tt0)[np.ix_(ix, ix)].tocsr()

    nm = int(mask.sum())
    c0 = np.zeros(len(ix))
    c0[np.where(mask)[0]] = c0m
    e0_h0 = float(c0 @ (h0m @ c0)) + fd0.const_e

    out = ~mask
    if max_holes is not None or max_parts is not None \
            or pattern is not None:
        holes, parts = _subspace_counts(L, ix, n_inactive, n_active)
        if pattern is not None:
            out &= (holes == pattern[0]) & (parts == pattern[1])
        if max_holes is not None:
            out &= holes <= max_holes
        if max_parts is not None:
            out &= parts <= max_parts
    rhs = (h @ c0)[out]
    a = h0m[np.ix_(np.where(out)[0], np.where(out)[0])]
    n_out = a.shape[0]
    if n_out == 0:
        return e0, 0.0
    lhs = sp.eye(n_out) * (e0_h0 - fd0.const_e) - a
    if n_out <= 3000:
        psi1 = np.linalg.solve(lhs.toarray(), rhs)
    else:
        psi1, info = spla.gmres(lhs.tocsc(), rhs, rtol=1e-12, maxiter=2000)
        assert info == 0, "GMRES failed"
    e2 = float(rhs @ psi1)
    return e0, e2


def _cas_rdm1(fd, n_inactive, n_active, c0m, ix, mask) -> np.ndarray:
    """Spatial active-space 1-RDM of the CASCI root (dense, small CAS),
    via the same term-table -> sparse-operator machinery that builds H
    (one consistent fermion-sign path)."""
    from ..core.expr import build_term_table
    from ..ops.local_ops import CRE_A, CRE_B, DES_A, DES_B
    rows = ix[mask]
    dm = np.zeros((n_active, n_active))
    for k1 in range(n_active):
        for k2 in range(k1, n_active):
            t1, t2 = n_inactive + k1, n_inactive + k2
            tt = build_term_table(fd.n_sites, [
                (1.0, [(t1, CRE_A), (t2, DES_A)]),
                (1.0, [(t1, CRE_B), (t2, DES_B)])])
            op = term_table_to_sparse(tt)[np.ix_(rows, rows)]
            val = float(c0m @ (op @ c0m))
            dm[k1, k2] = dm[k2, k1] = val
    return dm
