"""Two-process distributed tests on the CPU backend.

Exercises the real multi-host code paths the reference reaches via
torch.distributed.launch + NCCL (train.sh:5, engine.py:55-62, comm.py:47-87):
``jax.distributed`` rendezvous, a global mesh spanning both processes'
devices, ``shard_batch``'s process-local global-array assembly, one SPMD
train step with cross-process gradient reduction, and the picklable
all-gather used for eval result merging.

Each worker is a fresh subprocess (2 virtual CPU devices each -> 4 global).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
sys.path.insert(0, {repo!r})
import numpy as np

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

# The axon sitecustomize imports jax and pins its platform before env vars
# are consulted; JAX_PLATFORMS in the environment is NOT enough (same
# landmine as tests/conftest.py). Force the CPU backend through the config
# API before any backend/distributed initialization.
import jax

jax.config.update("jax_platforms", "cpu")

from smap_tpu.parallel.distributed import (all_gather_objects,
                                           initialize_distributed,
                                           is_main_process)

initialize_distributed(f"localhost:{{port}}", nproc, pid)

assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 2 * nproc, jax.device_count()
assert is_main_process() == (pid == 0)

# Picklable all-gather: differently-sized payloads per rank, process order.
gathered = all_gather_objects({{"rank": pid, "payload": "x" * (10 + pid * 7)}})
assert [g["rank"] for g in gathered] == list(range(nproc)), gathered
assert len(gathered[1]["payload"]) == 17

import jax.numpy as jnp

from smap_tpu.config import Config, ModelConfig, TrainConfig
from smap_tpu.models.smap import SMAP
from smap_tpu.parallel.mesh import make_mesh, shard_batch
from smap_tpu.train.solver import make_optimizer
from smap_tpu.train.step import (TrainBatch, create_train_state,
                                 make_jitted_train_step)

input_shape, out = (32, 48), (8, 12)
cfg = Config(model=ModelConfig(stage_num=1, output_shape=out,
                               compute_dtype="float32"),
             train=TrainConfig(max_people=2),
             input_shape=input_shape, output_shape=out)
mesh = make_mesh()
assert mesh.devices.size == 2 * nproc

model = SMAP(cfg.model)
variables = jax.jit(lambda k, x: model.init(k, x))(
    jax.random.PRNGKey(0), jnp.zeros((1, *input_shape, 3), jnp.float32))
tx = make_optimizer(cfg.train, mesh.devices.size)
state = create_train_state(variables, cfg, mesh.devices.size)
step = make_jitted_train_step(cfg, mesh, tx)

# Host-local shard: 2 samples of the 4-sample global batch, rank-dependent
# content (the gradient all-reduce must still produce identical losses).
rng = np.random.RandomState(pid)
b, (h, w) = 2, input_shape
bodys = np.zeros((b, 2, 15, 11), np.float32)
bodys[..., 0] = rng.uniform(0, w - 1, bodys.shape[:3])
bodys[..., 1] = rng.uniform(0, h - 1, bodys.shape[:3])
bodys[..., 2] = rng.uniform(100, 400, bodys.shape[:3])
bodys[..., 3] = 2
bodys[..., 7] = 1100.0
batch = TrainBatch(images=rng.randn(b, h, w, 3).astype(np.float32),
                   bodys=bodys, valids=np.ones((b, 57), np.float32),
                   scales=np.full((b,), 0.5, np.float32))
gbatch = shard_batch(batch, mesh)
assert gbatch.images.shape[0] == 2 * nproc, gbatch.images.shape

state, losses = step(state, gbatch)
total = float(losses["total_loss"])
assert np.isfinite(total), total
assert int(jax.device_get(state.step)) == 1
print(f"LOSS {{total:.9f}}", flush=True)
print("WORKER_OK", flush=True)
"""


EVAL_WORKER = r"""
import hashlib, json, os, sys
sys.path.insert(0, {repo!r})
import numpy as np

pid, nproc, port, data_dir = (int(sys.argv[1]), int(sys.argv[2]),
                              sys.argv[3], sys.argv[4])

import jax

jax.config.update("jax_platforms", "cpu")

from smap_tpu.parallel.distributed import initialize_distributed

initialize_distributed(f"localhost:{{port}}", nproc, pid)

import jax.numpy as jnp

from smap_tpu.config import Config, ModelConfig, PostProcessConfig
from smap_tpu.data.datasets import JointDataset, load_annotations
from smap_tpu.inference import SMAPInference, run_labeled_inference
from smap_tpu.models.smap import SMAP

input_shape, out = (32, 48), (8, 12)
cfg = Config(model=ModelConfig(stage_num=1, output_shape=out,
                               compute_dtype="float32"),
             post=PostProcessConfig(max_peaks=8, assoc_peaks=8),
             input_shape=input_shape, output_shape=out)
ds = JointDataset(load_annotations(os.path.join(data_dir, "annot.json")),
                  {{"MUPOTS": data_dir}}, cfg, "test",
                  with_augmentation=False)

model = SMAP(cfg.model)
variables = jax.jit(lambda k, x: model.init(k, x))(
    jax.random.PRNGKey(0), jnp.zeros((1, *input_shape, 3), jnp.float32))
engine = SMAPInference(variables, cfg)

# Per-rank contiguous shard (the reference's per-rank eval split,
# lib/utils/dataloader.py:79-85) + cross-process merge (comm.py:47-87).
result = run_labeled_inference(ds, engine, mode="generate_result",
                               batch_size=2, shard=pid, num_shards=nproc,
                               gather=True)
pairs = result["3d_pairs"]
assert len(pairs) == len(ds), (len(pairs), len(ds))
paths = [p["image_path"] for p in pairs]
assert paths == sorted(paths), paths   # rank-ordered merge = dataset order
digest = hashlib.sha256(
    json.dumps(pairs, sort_keys=True).encode()).hexdigest()
print(f"MERGED {{digest}}", flush=True)
print("WORKER_OK", flush=True)
"""


@pytest.mark.slow
def test_two_process_labeled_inference_gather(tmp_path):
    """VERDICT r4 item 7: the eval-merge path across 2 REAL processes —
    each rank runs its contiguous dataset shard through the inference
    engine, gathers, and must end up holding the identical merged
    3d_pairs (byte-identical JSON digest)."""
    import json

    cv2 = pytest.importorskip("cv2")

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    rng = np.random.RandomState(7)
    records = []
    for i in range(5):   # odd count: one rank gets the short shard
        h, w = 64, 96
        cv2.imwrite(str(data_dir / f"f{i}.jpg"),
                    (rng.rand(h, w, 3) * 255).astype(np.uint8))
        bodys = np.zeros((2, 15, 11))
        bodys[..., 0] = rng.uniform(8, w - 8, (2, 15))
        bodys[..., 1] = rng.uniform(8, h - 8, (2, 15))
        bodys[..., 2] = rng.uniform(200, 400, (2, 15))
        bodys[..., 3] = 2
        bodys[..., 4:7] = rng.randn(2, 15, 3) * 50
        bodys[..., 7] = 100.0
        bodys[..., 8] = 100.0
        bodys[..., 9] = w / 2
        bodys[..., 10] = h / 2
        records.append({"dataset": "MUPOTS", "img_paths": f"f{i}.jpg",
                        "img_height": h, "img_width": w, "isValidation": 1,
                        "bodys": bodys.tolist()})
    (data_dir / "annot.json").write_text(json.dumps({"root": records}))

    worker_py = tmp_path / "eval_worker.py"
    worker_py.write_text(EVAL_WORKER.format(repo=REPO))

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("PYTEST_CURRENT_TEST", None)

    procs = [subprocess.Popen(
        [sys.executable, str(worker_py), str(i), "2", str(port),
         str(data_dir)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out}"
        assert "WORKER_OK" in out, out

    digests = [line.split()[1] for out in outs for line in out.splitlines()
               if line.startswith("MERGED ")]
    assert len(digests) == 2 and digests[0] == digests[1], digests


@pytest.mark.slow
def test_two_process_train_step_and_allgather(tmp_path):
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER.format(repo=REPO))

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("PYTEST_CURRENT_TEST", None)

    procs = [subprocess.Popen(
        [sys.executable, str(worker_py), str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out}"
        assert "WORKER_OK" in out, out

    # Both processes must observe the identical global (all-reduced) loss.
    losses = [line.split()[1] for out in outs for line in out.splitlines()
              if line.startswith("LOSS ")]
    assert len(losses) == 2 and losses[0] == losses[1], losses
