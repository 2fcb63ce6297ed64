"""Host->device link rate for serving-sized buffers (VERDICT r2 item 9).

Measures device_put throughput for fresh (never-repeated) buffers at the
I420 batch size (~10 MB), the uint8-RGB size (~20 MB) and the f32 size
(~82 MB), across several draws. Run multiple times (separate grants) —
the link is part of the grant lottery (35-540 MB/s observed).

The outcome documents whether the wire format is already at its floor:
I420 (1.5 B/px) is what hardware video decoders emit; going below it
means either lossy re-encoding (diverges from the reference's numerics)
or shipping compressed bitstreams and decoding on the TPU, which has no
decoder. So the only remaining lever on the transfer term is the link
rate itself — i.e., the grant draw, not the format.

Run on TPU: python scripts/probes/_link_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import numpy as np


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(int.from_bytes(os.urandom(4), "little"))
    sizes = {
        "i420 batch-16 (10.2 MB)": (16, 768, 832),       # uint8 3H/2 x W
        "uint8 RGB batch-16 (20.4 MB)": (16, 512, 832, 3),
        "f32 batch-16 (81.8 MB)": None,                  # float32 below
    }
    for tag, shape in sizes.items():
        rates = []
        for _ in range(5):
            if shape is None:
                buf = rng.randn(16, 512, 832, 3).astype(np.float32)
            else:
                buf = rng.randint(0, 256, shape, dtype=np.uint8)
            t0 = time.perf_counter()
            jax.block_until_ready(jax.device_put(buf))
            dt = time.perf_counter() - t0
            rates.append(buf.nbytes / dt / 1e6)
        print(f"{tag}: median {np.median(rates):.0f} MB/s "
              f"[{', '.join(f'{r:.0f}' for r in rates)}]", flush=True)


if __name__ == "__main__":
    main()
