"""Hardware control for the scaling-efficiency measurement.

Measures aggregate throughput of an embarrassingly-parallel pure-CPU
workload (no Spark, no shared state) at several process counts. This
bounds the scaling efficiency ANY workload can achieve on this VM —
per-core throughput falls as cores engage (host frequency scaling /
contention), so the engine's N→4N efficiency must be judged against
this ceiling, not against an ideal 1.0.
"""

import json
import multiprocessing as mp
import time


def spin(n):
    x = 0
    for i in range(n):
        x += i * i % 7
    return x


def measure(procs, per=3_000_000):
    t0 = time.time()
    with mp.Pool(procs) as p:
        p.map(spin, [per] * procs * 4)
    return per * procs * 4 / (time.time() - t0)


if __name__ == "__main__":
    out = {}
    for procs in (1, 2, 8, 16, 32):
        out[str(procs)] = round(measure(procs) / 1e6, 1)
    out["eff_2_to_8"] = round(out["8"] / (4 * out["2"]), 3)
    out["eff_8_to_32"] = round(out["32"] / (4 * out["8"]), 3)
    print(json.dumps(out))
