"""Guard the driver contract: __graft_entry__.entry() compiles and
dryrun_multichip runs on the virtual CPU mesh."""

import importlib.util

import numpy as np

import jax


def _load():
    spec = importlib.util.spec_from_file_location(
        "graft", "/root/repo/__graft_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_entry_compiles():
    m = _load()
    fn, args = m.entry()
    out = jax.jit(fn)(*args)
    assert np.asarray(out).ndim == 1


def test_dryrun_multichip():
    m = _load()
    assert len(jax.devices()) >= 8
    m.dryrun_multichip(8)
