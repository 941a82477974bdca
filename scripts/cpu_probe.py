#!/usr/bin/env python
"""Host-ceiling probe for the multi-executor sim's exact core shape.

Measures what the HARDWARE gives up between W and 4W active cores with
ZERO shared software state: W (then 4W) independent Python processes,
each pinned to its own core (same contiguous layout the sim's taskset
uses), each doing an identical fixed amount of allocation-heavy
regex+string work (the extraction pipeline's profile — compiled regex
findall over fresh strings, list building, joins).  Per-wave aggregate
throughput in, probe efficiency out:

    eff_probe = (agg_4W / agg_W) / 4

Any Spark-level multi-executor efficiency measured on this host is
bounded above by eff_probe at the matching core counts; the gap between
the sim's number and eff_probe is the part attributable to Spark/plan
design, the rest is the VM's shared memory subsystem.

Two workloads, because they bound different channels:

* ``cpu`` (default): cache-resident regex+string building — bounds how
  much raw CORE throughput the VM gives up as more cores go active.
* ``mem``: per-worker 256 MB numpy copy loop — DRAM-bound, bounds the
  shared MEMORY-BANDWIDTH channel, which is what an allocation-heavy
  JVM (GC scans + young-gen churn) actually stresses.

Usage: python scripts/cpu_probe.py [workers_small] [iters] [cpu|mem]
(defaults 4 and 60 -> compares 4 vs 16 pinned cores; use iters ~2400
for cpu / ~150 for mem to get >=15 s walls)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

WORKER = r'''
import os, re, sys, time
os.sched_setaffinity(0, {int(sys.argv[1])})
iters = int(sys.argv[2])
pat = re.compile(r"(?i)(oppgave|task)\s+(\d+[a-z]?)\b|(\d+)\s*(?:poeng|points)")
t0 = time.time()
acc = 0
for i in range(iters):
    rows = []
    for j in range(400):
        s = (f"Oppgave {j} intro tekst {i} " * 6 + f"{j % 7} poeng. "
             + "x" * (j % 97))
        m = pat.findall(s)
        rows.append("|".join("".join(g) for g in m) + s.upper()[:40])
    acc += len(" ".join(rows))
print(time.time() - t0)
'''

WORKER_MEM = r'''
import os, sys, time
os.sched_setaffinity(0, {int(sys.argv[1])})
import numpy as np
iters = int(sys.argv[2])
a = np.arange(32 * 1024 * 1024, dtype=np.float64)  # 256 MB, far past LLC
b = np.empty_like(a)
t0 = time.time()
for i in range(iters):
    np.copyto(b, a)
    b[0] += 1.0
print(time.time() - t0)
'''


def run_wave(cores: list[int], iters: int, src: str = WORKER) -> float:
    """Launch one pinned worker per core; return aggregate work/sec."""
    procs = [
        subprocess.Popen([sys.executable, "-c", src, str(c), str(iters)],
                         stdout=subprocess.PIPE, text=True)
        for c in cores
    ]
    walls = [float(p.communicate()[0].strip()) for p in procs]
    return len(cores) * iters / max(walls), walls


def main() -> None:
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    mode = sys.argv[3] if len(sys.argv) > 3 else "cpu"
    src = WORKER_MEM if mode == "mem" else WORKER
    best = {}
    for _ in range(2):  # interleaved repeats, keep best wave (noisy host)
        for label, cores in (("small", list(range(w))),
                             ("large", list(range(4 * w)))):
            agg, walls = run_wave(cores, iters, src)
            if label not in best or agg > best[label][0]:
                best[label] = (agg, walls)
    eff = best["large"][0] / best["small"][0] / 4
    print(json.dumps({
        "mode": mode,
        "workers_small": w, "workers_large": 4 * w, "iters": iters,
        "agg_small": round(best["small"][0], 2),
        "agg_large": round(best["large"][0], 2),
        "walls_small": [round(x, 2) for x in best["small"][1]],
        "walls_large": [round(x, 2) for x in best["large"][1]],
        "probe_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
