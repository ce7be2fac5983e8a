"""gaopt / stopt CLI tools (reference pyblock2/driver/gaopt, stopt.py)."""

import os

import numpy as np

from block2_preview_tpu.core.fcidump import FCIDUMP


def test_gaopt_cli(tmp_path, capsys):
    from block2_preview_tpu.driver import gaopt
    fd = FCIDUMP.hubbard(6, t=1.0, u=2.0)
    fn = str(tmp_path / "FCIDUMP")
    fd.write(fn)
    rc = gaopt.main(["gaopt", "-fiedler", "-integral", fn,
                     "-wint", str(tmp_path / "FCIDUMP.NEW")])
    out = capsys.readouterr().out
    assert rc == 0
    assert "DMRG REORDER FORMAT" in out
    fd2 = FCIDUMP.parse(str(tmp_path / "FCIDUMP.NEW"))
    assert fd2.n_sites == 6
    # GA path
    rc = gaopt.main(["gaopt", "-integral", fn])
    assert rc == 0
    assert "MINIMIZED F" in capsys.readouterr().out


def test_stopt_cli(tmp_path, capsys):
    from block2_preview_tpu.driver import stopt
    fd = FCIDUMP.hubbard(4, t=1.0, u=2.0)
    fn = str(tmp_path / "FCIDUMP")
    fd.write(fn)
    rc = stopt.main(["stopt", fn, "30", "0"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "E(total)" in out
