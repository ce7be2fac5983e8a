#!/usr/bin/env python
"""Read a StackBlock MPS, write a framework MPS (reference
pyblock2/driver/readwfn.py CLI).

Usage:
    python readwfn.py -config dmrg.conf -out ./out
    python readwfn.py -prefix ./scratch -integral FCIDUMP -out ./out

The StackBlock scratch is the node0/ directory written by writewfn.py
(portable .npz containers holding the same StateInfo / rotation-matrix /
wavefunction objects the reference script loads through pyblock; see
block2_preview_tpu/interop/stackblock.py).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from block2_preview_tpu.core.expr import qc_term_table  # noqa: E402
from block2_preview_tpu.core.fcidump import FCIDUMP  # noqa: E402
from block2_preview_tpu.dmrg.mpo_builder import build_mpo  # noqa: E402
from block2_preview_tpu.interop.stackblock import readwfn  # noqa: E402
from block2_preview_tpu.utils.io import save_mps  # noqa: E402


def main(argv):
    args = {}
    i = 1
    while i < len(argv):
        if argv[i] in ("-expect",):
            args[argv[i][1:]] = True
            i += 1
        elif argv[i].startswith("-"):
            args[argv[i][1:]] = argv[i + 1]
            i += 2
        else:
            args.setdefault("config", argv[i])
            i += 1
    scratch = "./"
    integral = "FCIDUMP"
    out_dir = args.get("out", "./out")
    if "config" in args:
        from block2_preview_tpu.driver.parser import parse
        dic = parse(args["config"])
        dd = os.path.dirname(args["config"]) or "."
        scratch = dic.get("prefix", "./")
        if not os.path.isabs(scratch):
            scratch = os.path.join(dd, scratch)
        integral = dic["orbitals"]
        if not os.path.isabs(integral):
            integral = os.path.join(dd, integral)
    scratch = args.get("prefix", scratch)
    integral = args.get("integral", integral)
    fd = FCIDUMP.parse(integral)
    tt = qc_term_table(fd)
    mpo = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
    mps = readwfn(scratch, mpo.group)
    os.makedirs(out_dir, exist_ok=True)
    save_mps(mps, os.path.join(out_dir, "KET.npz"))
    print("MPS written to", os.path.join(out_dir, "KET.npz"))
    if args.get("expect"):
        from block2_preview_tpu.dmrg.expect import mpo_expectation
        print(mpo_expectation(mpo, mps))


if __name__ == "__main__":
    main(sys.argv)
