"""Quantum-chemistry front-end: FCIDUMP loading (reference
src/core/integral.hpp:540) — the ab initio entry point of the framework."""

from ..core.fcidump import FCIDUMP


def qc_fcidump(path: str) -> FCIDUMP:
    return FCIDUMP.parse(path)
