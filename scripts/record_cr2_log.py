"""Extract the round-4 Cr2 record from a run_cr2.py log into
RESULTS/cr2_svp_tpu.json.  Usage: python scripts/record_cr2_log.py <log>"""

import json
import re
import sys

import numpy as np

log = open(sys.argv[1]).read()
site_t = [(int(a), float(b)) for a, b in
          re.findall(r"site\s+(\d+) .*? t = ([0-9.]+)s", log)]
sweeps = re.findall(
    r"sweep\s+(\d+) ([FB]) D=\s*(\d+) .*?E = (-?\d+\.\d+)", log)
env = re.search(r"env init: t=([0-9.]+)s", log)

# per-sweep site times: sweep boundaries = "sweep" summary lines order
chunks = []
cur = []
idx = 0
for line in log.splitlines():
    m = re.search(r"site\s+\d+ .*? t = ([0-9.]+)s", line)
    if m:
        cur.append(float(m.group(1)))
    if re.match(r"sweep\s+\d+ [FB]", line):
        chunks.append(cur)
        cur = []

rec = {
    "what": ("Cr2/SVP D=250 on the TPU v5e resident engine (f32, "
             "occ-biased warmup) — round-4 state of the north-star "
             "deck: ALL 41 SITES COMPLETE ON DEVICE (rounds 1-3 never "
             "passed site 16)"),
    "fixes": ("blockv2 stage-3 watchdog overrun -> lane-bounded "
              "launches + blocking v3 (rotate-once + MXU symbol-mix "
              "GEMM); Davidson basis-collapse -> orthogonality-"
              "contamination stop; mix v4 one-launch tiled GEMM + "
              "packed uploads"),
    "env_init_s": float(env.group(1)) if env else None,
    "sweeps": [],
    "block2_host_comparison": (
        "block2 SU2 1-thread does the FULL 42-site D=250 sweep in "
        "20-61 s (RESULTS/block2_host_baseline.json); our sweep walls "
        "below are dominated by per-signature remote compiles "
        "(~40-70 s each, disk-cached) — the first sweep in each "
        "DIRECTION pays the storm, later sweeps in that direction are "
        "warm"),
}
for k, (num, fb, D, e) in enumerate(sweeps):
    ts = chunks[k] if k < len(chunks) else []
    rec["sweeps"].append({
        "sweep": int(num), "dir": fb, "D": int(D), "energy": float(e),
        "sites": len(ts),
        "wall_s": round(float(np.sum(ts)), 1) if ts else None,
        "site_s_median": round(float(np.median(ts)), 2) if ts else None,
        "site_s_max": round(float(np.max(ts)), 2) if ts else None,
    })
with open("RESULTS/cr2_svp_tpu.json", "w") as f:
    json.dump(rec, f, indent=1)
print(json.dumps(rec, indent=1))
