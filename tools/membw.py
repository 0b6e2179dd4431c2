"""Host memory-bandwidth scaling probe — the evidence behind the choice of
scaling-bench leg sizes in BENCH/BASELINE.md.

Measures aggregate memcpy bandwidth (read+write bytes) at increasing
process counts. Levels are interleaved round-robin across trials so host
drift hits every level equally; the per-level MEDIAN is the signal (this
VM's single-sample numbers swing 2-4x between minutes).

Why it matters for the scaling criterion: the north rule compares N vs 4N
*nodes*, where per-node DRAM bandwidth is constant. On this single shared
host, aggregate bandwidth scales linearly only up to ~4 workers and is
flat (~77 GB/s) from 8 up — so a leg pair above 4 CPUs measures the
host's memory ceiling, not the pipeline's structure. `bench.py --scaling`
therefore defaults to the 1->4 leg pair (inside the linear region); the
pure-bandwidth efficiency cap per leg pair is bw(4N)/bw(N)/4 from this
probe's output.

Usage: python tools/membw.py [trials]   (default 5; ~2 min)
"""
import json
import multiprocessing as mp
import statistics
import sys
import time


def _worker(q, seconds=2.5):
    import numpy as np
    src = np.random.randint(0, 255, size=128 * 1024 * 1024, dtype=np.uint8)
    dst = np.empty_like(src)
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < seconds:
        np.copyto(dst, src)
        n += 1
    q.put(n * src.nbytes * 2 / (time.perf_counter() - t0))


def measure(nproc: int) -> float:
    """Aggregate GB/s across ``nproc`` concurrent copy loops."""
    q = mp.Queue()
    ps = [mp.Process(target=_worker, args=(q,)) for _ in range(nproc)]
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(rates) / 1e9


if __name__ == "__main__":
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    levels = (1, 2, 4, 8, 16, 32)
    samples: dict[int, list[float]] = {n: [] for n in levels}
    for _ in range(trials):
        for n in levels:
            samples[n].append(measure(n))
    out = {n: {"median_gbps": round(statistics.median(v), 2),
               "all": [round(x, 1) for x in sorted(v)]}
           for n, v in samples.items()}
    print(json.dumps(out, indent=1))
