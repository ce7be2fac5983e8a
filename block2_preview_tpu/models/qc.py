"""Quantum-chemistry front-end: FCIDUMP loading (reference
src/core/integral.hpp:540) — the ab initio entry point of the framework."""

from ..core.fcidump import FCIDUMP


def qc_fcidump(path: str) -> FCIDUMP:
    return FCIDUMP.parse(path)


def lz_system(fd: FCIDUMP, target_lz: int = 0):
    """Symmetry setup for SZLZ / SZK modes (reference symmetry.hpp:864 SZLZ,
    :738 SZKLong): per-orbital additive labels from the FCIDUMP KSYM line.
    KMOD=0 gives plain-integer Lz conservation; KMOD=N a mod-N momentum.

    Returns (group, site_quanta, target, pg_mode) ready for
    qc_raw_terms(fd, pg_mode=pg_mode) + build_mpo(site_quanta=...).
    """
    from ..core.symmetry import SymmetryGroup
    assert fd.k_sym is not None, "FCIDUMP has no KSYM labels"
    mod = int(fd.k_mod)
    if mod > 0:
        kind = f"mod{mod}"
        pg_mode: object = mod
        red = lambda x: int(x) % mod           # noqa: E731
    else:
        kind = "u1"
        pg_mode = "lz"
        red = int
    group = SymmetryGroup(("u1", "u1", kind), ("n", "twosz", "lz"))
    site_quanta = [[(0, 0, 0), (1, 1, red(k)), (1, -1, red(k)),
                    (2, 0, red(2 * k))] for k in fd.k_sym]
    target = (fd.n_elec, fd.twos, red(target_lz))
    return group, site_quanta, target, pg_mode
