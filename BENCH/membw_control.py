"""Memory-bandwidth ceiling control (companion to cpu_control.py).

cpu_control.py measures a pure-ALU workload (tiny working set, no DRAM
traffic) — it bounds CPU-frequency/contention effects but NOT the
memory-bus ceiling. Scan+aggregate stages stream gigabytes through
DRAM; on a single box all executor threads share one memory bus, so a
bandwidth-bound stage stops scaling once the bus saturates, no matter
how many cores remain idle. This control measures the aggregate
streaming bandwidth at several process counts: if it plateaus by 8
processes, an 8→32 efficiency of a streaming stage is capped at
(plateau / bw_at_8) / 4 on THIS box — while a real 4N-executor cluster
adds nodes with their own memory channels.
"""

import json
import multiprocessing as mp
import time

import numpy as np

N = 50_000_000  # 400 MB per process (float64) — far beyond L3


def stream(_):
    a = np.ones(N, dtype=np.float64)
    t0 = time.time()
    s = 0.0
    for _ in range(4):
        s += float(a.sum())  # sequential read of 400 MB per pass
    dt = time.time() - t0
    return 4 * N * 8 / dt  # bytes/s read by this process


if __name__ == "__main__":
    out = {}
    for procs in (1, 2, 8, 16, 32):
        with mp.Pool(procs) as p:
            per = p.map(stream, range(procs))
        out[str(procs)] = round(sum(per) / 1e9, 2)  # aggregate GB/s
    out["bw_eff_8_to_32"] = round(out["32"] / (4 * out["8"]), 3)
    print(json.dumps(out))
