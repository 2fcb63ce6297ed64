import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _calibrate

t = _calibrate()
tries = int(os.environ.get("SPLIT_TRY", "0"))
print(f"# calibration {t*1000:.0f} ms try {tries}", flush=True)
if t > 0.1 and tries < 6:
    os.environ["SPLIT_TRY"] = str(tries + 1)
    os.execv(sys.executable, [sys.executable] + sys.argv)

from smap_tpu.config import PAF_VECTOR, NUM_JOINTS
from smap_tpu.ops.association import associate
from smap_tpu.ops.nms import extract_peaks
from smap_tpu.ops.paf import paf_scores

B, H, W = 16, 128, 208
key = jax.random.PRNGKey(0)
hm43 = jax.random.uniform(key, (B, 43, H, W), jnp.float32)
rdm = jax.random.uniform(key, (B, H, W), jnp.float32)
pairs = jnp.asarray(PAF_VECTOR, jnp.int32)


def bench(name, f, *args):
    r = f(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = f(*args)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1000:.0f} ms", flush=True)
    return r


nms_b = jax.jit(jax.vmap(
    lambda hm: extract_peaks(hm[:NUM_JOINTS] / 255.0, max_peaks=127)))
peaks = bench("nms x16", nms_b, hm43)

paf_b = jax.jit(jax.vmap(
    lambda hm, pk: paf_scores(hm[NUM_JOINTS:] / 127.0, pk, pairs)))
table = bench("paf_scores x16", paf_b, hm43,
              jax.tree.map(lambda a: a, peaks))

assoc_b = jax.jit(jax.vmap(lambda pk, tb, rd: associate(pk, tb, rd)))
bench("associate x16", assoc_b, peaks, table, rdm)

print("# recalibrate:", round(_calibrate() * 1000), "ms", flush=True)
