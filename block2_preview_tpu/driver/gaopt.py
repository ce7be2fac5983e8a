"""Genetic-algorithm orbital-reordering CLI (reference
pyblock2/driver/gaopt).

Usage:
    python -m block2_preview_tpu.driver.gaopt -integral FCIDUMP
    python -m block2_preview_tpu.driver.gaopt -config gaopt.conf \\
        -integral FCIDUMP [-wint FCIDUMP.NEW] [-w kmat] [-s] [-fiedler]

Config keys (gaopt.conf, reference-compatible subset): maxcomm maxgen
maxcell cloning mutation elite scale method target.
Prints ``DMRG REORDER FORMAT`` and the 1-based ordering; `-wint` writes
the reordered FCIDUMP.
"""

from __future__ import annotations

import sys

import numpy as np

from ..core.fcidump import FCIDUMP
from ..dmrg.orbital_ordering import (evaluate, fiedler, ga_opt,
                                     kmat_from_fcidump)


def parse_args(argv):
    dic = {}
    i = 1
    while i < len(argv):
        a = argv[i]
        if a in ("-s", "-fiedler"):
            dic[a[1:]] = ""
            i += 1
        elif a.startswith("-"):
            dic[a[1:]] = argv[i + 1]
            i += 2
        else:
            i += 1
    return dic


def read_config(fn):
    opts = {}
    with open(fn) as f:
        for line in f:
            xs = line.split("!")[0].split()
            if len(xs) >= 2:
                opts[xs[0].lower()] = xs[1]
    return opts


def main(argv=None):
    argv = sys.argv if argv is None else argv
    dic = parse_args(argv)
    if "integral" not in dic:
        print(__doc__)
        return 1
    opts = read_config(dic["config"]) if "config" in dic else {}
    if "s" in dic:
        kmat = np.loadtxt(dic["integral"])
        fd = None
    else:
        fd = FCIDUMP.parse(dic["integral"])
        kmat = kmat_from_fcidump(fd)
    if "w" in dic:
        np.savetxt(dic["w"], kmat)
    if "fiedler" in dic:
        ordering = fiedler(kmat)
        f = evaluate(kmat, ordering)
    else:
        n_gen = int(opts.get("maxgen", 10000))
        n_cfg = int(opts.get("maxcell", 54))
        n_comm = int(opts.get("maxcomm", 1))
        best_f, ordering = np.inf, None
        for it in range(n_comm):
            o = ga_opt(kmat, n_generations=n_gen, n_configs=n_cfg,
                       seed=1234 + it)
            f = evaluate(kmat, o)
            if f < best_f:
                best_f, ordering = f, o
        f = best_f
    print("MINIMIZED F = %20.12f" % f)
    print("DMRG REORDER FORMAT")
    print(",".join(str(int(x) + 1) for x in ordering))
    if "wint" in dic and fd is not None:
        fd.reorder(np.asarray(ordering)).write(dic["wint"])
    return 0


if __name__ == "__main__":
    sys.exit(main())
