#!/usr/bin/env python
"""Platform-ceiling microbenchmarks for the scaling evidence.

The north-rule criterion (throughput scaling efficiency >=0.8 from N to 4N
executors) can only be judged against what THIS sandbox VM can scale at
all: a single socket's DRAM bandwidth saturates, and hypervisor/turbo
behavior drifts hour-to-hour, so ceilings must be measured in the SAME
session as the engine numbers (see BENCH/BASELINE.md par.3).

Two ceilings, each as N independent single-core processes with a
filesystem barrier (identical protocol to bench.py --scaling-multiproc):

* cpu — sha256 over an in-cache buffer: pure compute, no memory pressure.
  If THIS doesn't scale, nothing will (hypervisor/turbo ceiling).
* mem — numpy array copies over 1 GiB working sets: streaming DRAM
  bandwidth, the resource a single socket cannot multiply.

Usage: python BENCH/ceilings.py            # pairs 2->8 and 4->16
       python BENCH/ceilings.py 2,8        # one pair
Prints one JSON line per ceiling with per-level throughput + efficiency.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import tempfile
import time

CPU_ITERS = 48          # sha256 rounds over 64 MiB
MEM_COPIES = 12         # 1 GiB array copies


def _wait_barrier(barrier: str, idx: int) -> None:
    with open(os.path.join(barrier, f"ready_{idx}"), "w") as f:
        f.write("1")
    while not os.path.exists(os.path.join(barrier, "go")):
        time.sleep(0.1)


def _child(kind: str, idx: int, barrier: str) -> None:
    if kind == "cpu":
        buf = os.urandom(64 * 1024 * 1024)
        hashlib.sha256(buf).digest()  # warm
        _wait_barrier(barrier, idx)
        t0 = time.time()
        for _ in range(CPU_ITERS):
            hashlib.sha256(buf).digest()
        dt = time.time() - t0
        work = CPU_ITERS * len(buf)
    else:
        import numpy as np

        a = np.random.default_rng(idx).random(128 * 1024 * 1024)  # 1 GiB f64
        b = a.copy()  # warm + allocate target
        _wait_barrier(barrier, idx)
        t0 = time.time()
        for _ in range(MEM_COPIES):
            np.copyto(b, a)
        dt = time.time() - t0
        work = MEM_COPIES * a.nbytes * 2  # read + write
    print(json.dumps({"sec": dt, "bytes": work}))


def _ensemble(kind: str, n: int) -> float:
    """Aggregate throughput (bytes/sec) of n synchronized children."""
    barrier = tempfile.mkdtemp(prefix=f"ceil_{kind}_")
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--child", kind, str(i), barrier],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        )
        for i in range(n)
    ]
    deadline = time.time() + 300
    while time.time() < deadline:
        if all(
            os.path.exists(os.path.join(barrier, f"ready_{i}"))
            for i in range(n)
        ):
            break
        time.sleep(0.2)
    with open(os.path.join(barrier, "go"), "w") as f:
        f.write("1")
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(json.loads([l for l in out.splitlines() if l.startswith("{")][-1]))
    span = max(o["sec"] for o in outs)  # straggler defines completion
    return sum(o["bytes"] for o in outs) / span


def run(pairs) -> None:
    for kind in ("cpu", "mem"):
        report = {"ceiling": kind}
        for (a, b) in pairs:
            ta = _ensemble(kind, a)
            tb = _ensemble(kind, b)
            report[f"n{a}_gbps"] = round(ta / 1e9, 1)
            report[f"n{b}_gbps"] = round(tb / 1e9, 1)
            report[f"eff_{a}to{b}"] = round((tb / ta) / (b / a), 3)
        print(json.dumps(report))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _child(sys.argv[2], int(sys.argv[3]), sys.argv[4])
    else:
        if len(sys.argv) > 1:
            a, b = (int(x) for x in sys.argv[1].split(","))
            pairs = [(a, b)]
        else:
            pairs = [(2, 8), (4, 16)]
        run(pairs)
