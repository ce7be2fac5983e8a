"""Parse per-site walls from a pair of bounded run_cr2 logs (cold jit
cache vs warm) into RESULTS/warm_sweep_r5.json — the round-5 final
site-0 / plan-persistence evidence.

Usage: python scripts/record_warm_sweep.py <cold.log> <warm.log> [warm2.log]
"""

import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, os.pardir))

SITE_RE = re.compile(
    r"(?:-->|<--) site\s+(\d+) E = (-?\d+\.\d+)\s+dw = \S+\s+"
    r"nmv = (\d+)\s+t = (\d+\.\d+)s")
ENV_RE = re.compile(r"env init: t=(\d+\.\d+)s")
ASM_RE = re.compile(r"\[asm t=(\d+)\] (lw|rw)=(\d+\.\d+)s")


def parse(path):
    sites, asm, env = {}, {}, None
    with open(path) as f:
        for line in f:
            m = SITE_RE.search(line)
            if m:
                t = int(m.group(1))
                sites[t] = {"E": float(m.group(2)),
                            "nmv": int(m.group(3)),
                            "wall_s": float(m.group(4))}
            m = ASM_RE.search(line)
            if m:
                asm.setdefault(int(m.group(1)), {})[m.group(2)] = \
                    float(m.group(3))
            m = ENV_RE.search(line)
            if m:
                env = float(m.group(1))
    return {"env_init_s": env, "sites": sites, "asm": asm}


def main():
    runs = [parse(p) for p in sys.argv[1:]]
    names = ["cold", "warm", "warm2"][:len(runs)]
    rec = {"what": ("Bounded back-to-back Cr2/SVP D=250 jax_resident "
                    "f32 sweep-0 runs on the real chip: cold jit/plan "
                    "caches, then warm (fixed plan persistence).  "
                    "Energies must be identical across runs."),
           "runs": dict(zip(names, runs))}
    # parity check across runs
    common = set.intersection(*[set(r["sites"]) for r in runs])
    mism = [t for t in sorted(common)
            if len({r["sites"][t]["E"] for r in runs}) != 1]
    rec["energy_parity"] = "exact" if not mism else f"MISMATCH {mism}"
    out = os.path.join(REPO, "RESULTS", "warm_sweep_r5.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print("wrote", out, "parity:", rec["energy_parity"])
    for nm, r in zip(names, runs):
        ws = [f"{t}:{v['wall_s']:.1f}" for t, v in
              sorted(r["sites"].items())]
        print(nm, "env", r["env_init_s"], "|", " ".join(ws))


if __name__ == "__main__":
    main()
