"""Host-noise probe (BENCH/host_noise_r4.md, BENCH/dram_ceiling.md).

One worker running the SPIMI build's memory-traffic shape — 10M-element
int64 ``sort`` + ``diff`` + ``flatnonzero`` + gather per iteration. On a
clean host this settles to ~0.21-0.30 s/iter; during a hypervisor noise
window identical iterations take seconds (200x swings measured round 4,
with clean in-VM counters throughout). The measurement discipline:
benchmark numbers are recordable only when the probe's steady reading is
<= ~0.35 s/iter; bench.py runs this before measuring and embeds the
reading in its output JSON so every recorded run carries its own
host-cleanliness evidence.
"""

import json
import time

import numpy as np


def probe(iters: int = 6, n: int = 10_000_000, seed: int = 0) -> list[float]:
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, 1 << 40, size=n, dtype=np.int64)
    times = []
    for _ in range(iters):
        t0 = time.monotonic()
        s = np.sort(keys)
        nz = np.flatnonzero(np.diff(s))
        _ = s[nz]
        times.append(round(time.monotonic() - t0, 3))
    return times


if __name__ == "__main__":
    ts = probe()
    steady = min(ts)
    print(
        json.dumps(
            {
                "probe_iters_sec": ts,
                "probe_steady_sec": steady,
                "clean": steady <= 0.35,
            }
        )
    )
