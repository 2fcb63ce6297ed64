"""Is the relay's host->device link content-cached? Cold vs warm puts.

Round-5 smoking gun (_ingest_context_probe.py): on a grant whose
fixed-seed link probe measured 442 MB/s, a plain idle-device put of a
10.2 MB FRESH buffer took 337 ms (~30 MB/s) — and sync/in-flight
context made no difference. Hypothesis: the relay content-addresses
transfer payloads; `bench._link_rate_mbps`'s RandomState(17) buffers are
byte-identical across every run ever made, so the "link lottery"
(40-1300 MB/s) is actually cache-hit-rate, and the COLD rate — what a
real serving stream pays for genuinely new frames — is ~30-80 MB/s
everywhere. That would make the e2e headline (63.8 img/s = 10.2 MB /
~40 MB/s per batch-16) LINK-WALL-bound, full stop.

Arms:
  cold:     4 distinct os.urandom 10.2 MB buffers (never seen anywhere)
  rewarm:   the SAME 4 buffers again (in-process warm)
  seed17:   bench._link_rate_mbps's exact buffers (cross-process warm)
  threads2/4: concurrent cold puts from 2/4 Python threads — does
            aggregate cold bandwidth scale with connections? (If yes, a
            transfer-thread pool is a real serving lever.)

Run on TPU: python scripts/probes/_link_cold_warm_probe.py
"""

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np

NBYTES = int(10.2 * (1 << 20))


def _rate(nbufs, seconds):
    return nbufs * NBYTES / seconds / 1e6


def main():
    import jax

    print("backend:", jax.default_backend(), flush=True)
    # No bench re-roll preamble: this probe characterizes WHATEVER grant
    # it lands on — the cold/warm RATIO is the signal, not the level.
    # (Also: the bench preamble's own link gate is the thing under test.)
    jax.block_until_ready(jax.device_put(np.zeros(1024, np.uint8)))

    def timed_put(buf):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(buf))
        return time.perf_counter() - t0

    cold_bufs = [np.frombuffer(os.urandom(NBYTES), np.uint8)
                 for _ in range(4)]
    cold = [timed_put(b) for b in cold_bufs]
    print(f"cold:    {[f'{t*1e3:.0f}' for t in cold]} ms  "
          f"median {_rate(1, float(np.median(cold))):.0f} MB/s", flush=True)

    rewarm = [timed_put(b) for b in cold_bufs]
    print(f"rewarm:  {[f'{t*1e3:.0f}' for t in rewarm]} ms  "
          f"median {_rate(1, float(np.median(rewarm))):.0f} MB/s",
          flush=True)

    rng = np.random.RandomState(17)
    seed17 = [rng.randint(0, 256, (NBYTES,), dtype=np.uint8)
              for _ in range(4)]
    s17 = [timed_put(b) for b in seed17]
    print(f"seed17:  {[f'{t*1e3:.0f}' for t in s17]} ms  "
          f"median {_rate(1, float(np.median(s17))):.0f} MB/s", flush=True)

    for nthreads in (2, 4):
        bufs = [np.frombuffer(os.urandom(NBYTES), np.uint8)
                for _ in range(nthreads * 2)]
        with ThreadPoolExecutor(nthreads) as pool:
            t0 = time.perf_counter()
            list(pool.map(timed_put, bufs))
            dt = time.perf_counter() - t0
        print(f"threads{nthreads}: {len(bufs)} cold puts in {dt*1e3:.0f} ms "
              f"aggregate {_rate(len(bufs), dt):.0f} MB/s", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
