"""Normal ordering w.r.t. the Fermi vacuum (reference NormalOrder /
WickNormalOrder, pyblock2/driver/core.py:8353): verify
H = E_HF + sum f_pq {p+ q} + 1/4 sum <pq||rs> {p+ q+ s r}
by expanding the normal-ordered products back into plain operators."""

import numpy as np

from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.uc.mp import normal_ordered_integrals
from block2_preview_tpu.utils.ed import term_table_to_sparse


def _dense_ops(n):
    X = np.array([[0.0, 1.0], [1.0, 0.0]])
    Y = np.array([[0.0, -1.0j], [1.0j, 0.0]])
    Z = np.diag([1.0, -1.0])
    I2 = np.eye(2)

    def ann(p):
        mats = [Z] * p + [(X + 1j * Y) / 2] + [I2] * (n - p - 1)
        out = np.eye(1)
        for m in mats:
            out = np.kron(out, m)
        return out
    return [ann(p) for p in range(n)]


def test_normal_ordered_identity():
    fd = FCIDUMP.hubbard(3, t=1.0, u=2.0)
    e_hf, f, v = normal_ordered_integrals(fd)
    n = 2 * fd.n_sites
    occ = set(range(fd.n_elec))
    g = np.diag([1.0 if p in occ else 0.0 for p in range(n)])
    a = _dense_ops(n)
    c = [m.conj().T for m in a]
    dim = 2 ** n
    eye = np.eye(dim)

    def no1(p, q):
        return c[p] @ a[q] - g[p, q] * eye

    H = e_hf * eye.astype(complex)
    for p in range(n):
        for q in range(n):
            if f[p, q] != 0.0:
                H = H + f[p, q] * no1(p, q)
    for p in range(n):
        for q in range(n):
            for r in range(n):
                for s in range(n):
                    w = v[p, q, r, s]
                    if w == 0.0:
                        continue
                    plain = c[p] @ c[q] @ a[s] @ a[r]
                    singles = (g[p, r] * (c[q] @ a[s])
                               + g[q, s] * (c[p] @ a[r])
                               - g[p, s] * (c[q] @ a[r])
                               - g[q, r] * (c[p] @ a[s]))
                    consts = (g[p, r] * g[q, s] - g[p, s] * g[q, r]) * eye
                    H = H + 0.25 * w * (plain - singles + consts)

    # plain spin-orbital Hamiltonian, dense, from the same integrals
    from block2_preview_tpu.uc.mp import spin_orbital_integrals
    h1, vv = spin_orbital_integrals(fd)
    H0 = np.zeros((dim, dim), dtype=complex)
    for p in range(n):
        for q in range(n):
            if h1[p, q] != 0.0:
                H0 += h1[p, q] * (c[p] @ a[q])
    for p in range(n):
        for q in range(n):
            for r in range(n):
                for s in range(n):
                    if vv[p, q, r, s] != 0.0:
                        H0 += 0.25 * vv[p, q, r, s] * (
                            c[p] @ c[q] @ a[s] @ a[r])
    assert np.abs(H - H0).max() < 1e-10
    # and E_HF is the aufbau expectation
    vac = np.zeros(dim)
    # aufbau determinant: first n_elec spin orbitals occupied
    idx = 0
    for p in range(n):
        idx = idx * 2 + (1 if p < fd.n_elec else 0)
    vac[idx] = 1.0
    assert abs(vac @ H0.real @ vac - e_hf) < 1e-10