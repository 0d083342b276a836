"""Reconstruct BENCH_DEEP20M_r03.json from /tmp/deep20m.log.

Insurance for the long-running >HBM-scale run (`bench_deep20m.py` writes its
artifact only after the final sweep point): every sweep row is LOG'd as a
JSON line as soon as it is measured, so if the round ends mid-sweep this
rebuilds the artifact from whatever completed.  The canonical end-of-script
write produces the same shape and overwrites this.

Run: python scripts/rescue_deep20m.py [logpath]
"""

import json
import re
import sys

LOGP = sys.argv[1] if len(sys.argv) > 1 else "/tmp/deep20m.log"
OUT = "/root/repo/BENCH_DEEP20M_r04.json"

# same env overrides (and defaults) as bench_deep20m.py, so a rescue of an
# env-overridden run stamps the right n/n_shards and build rate
import os  # noqa: E402

N = int(os.environ.get("DEEP_N", 20_000_000))
D = 128
SHARDS = int(os.environ.get("DEEP_SHARDS", 24))

rows = []
built = 0
build_s = None
with open(LOGP) as f:
    for line in f:
        line = line.strip()
        m = re.search(r"merged build: (\d+)s", line)
        if m:
            build_s = float(m.group(1))
        if "built" in line and "merged" in line:
            built += 1
        if line.startswith("[deep] {"):
            try:
                rows.append(json.loads(line[len("[deep] "):]))
            except json.JSONDecodeError:
                pass

best = None
timed = [r for r in rows if r.get("qps")]   # skip ceiling rows (qps None)
for r in timed:
    if r.get("recall", 0) >= 0.9 and (best is None or r["qps"] > best["qps"]):
        best = r
top = best or (max(timed, key=lambda r: r["recall"]) if timed else None)

# honest metric naming: a run that never reached the 0.9 recall bar must
# not report a QPS under a name that says it did
met = best is not None
out = {
    "metric": ("deep20m_tiered_qps_at_recall0.9" if met
               else "deep20m_tiered_best_recall (0.9 bar NOT met)"),
    "value": top["qps"] if met else (top["recall"] if top else 0),
    "unit": "qps" if met else "recall@10",
    "extra": {
        "n": N, "d": D, "n_shards": SHARDS, "overlap": 2, "codes": "pq32",
        "shards_built": built,
        "build_s": build_s,
        "build_points_per_s": round(N / build_s) if build_s else None,
        "recall": top["recall"] if top else None,
        "config": f"L={top['l']}" if top else None,
        "sweep": rows,
        "partial": "rescued_from_log (run interrupted before final write)",
    },
}
with open(OUT, "w") as f:
    f.write(json.dumps(out) + "\n")
print(json.dumps(out))
