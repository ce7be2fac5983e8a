#!/usr/bin/env python
"""Write a framework MPS as a StackBlock wavefunction scratch (reference
pyblock2/driver/writewfn.py CLI).

Usage:
    python writewfn.py -config dmrg.conf -load ./out
    python writewfn.py -prefix ./scratch -integral FCIDUMP -load ./out

-load points at a directory holding KET.npz (as written by readwfn.py or
utils.io.save_mps); -prefix receives the node0/ StackBlock scratch (see
block2_preview_tpu/interop/stackblock.py for the container format).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from block2_preview_tpu.interop.stackblock import writewfn  # noqa: E402
from block2_preview_tpu.utils.io import load_mps  # noqa: E402


def main(argv):
    args = {}
    i = 1
    while i < len(argv):
        if argv[i].startswith("-"):
            args[argv[i][1:]] = argv[i + 1]
            i += 2
        else:
            args.setdefault("config", argv[i])
            i += 1
    scratch = "./"
    load_dir = args.get("load", "./out")
    if "config" in args:
        from block2_preview_tpu.driver.parser import parse
        dic = parse(args["config"])
        dd = os.path.dirname(args["config"]) or "."
        scratch = dic.get("prefix", "./")
        if not os.path.isabs(scratch):
            scratch = os.path.join(dd, scratch)
    scratch = args.get("prefix", scratch)
    mps = load_mps(os.path.join(load_dir, "KET.npz"))
    writewfn(mps, scratch)
    print("StackBlock scratch written to", os.path.join(scratch, "node0"))


if __name__ == "__main__":
    main(sys.argv)
