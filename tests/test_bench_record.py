"""Unit tests for the bench record math and physics guards.

bench.py's JSON line is the driver-facing artifact of every round, and
its replay guards are what keep physically-impossible relay draws out of
the record (docs/perf_notes.md "Round-3 re-certification"). These tests
pin the pure-host parts: record schema, MFU arithmetic, and the
first-principles guard constants. No device work — importing bench only
defines module constants; jax is imported lazily inside its functions.
"""

import importlib
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import bench_train  # noqa: E402


def test_make_record_schema_and_mfu():
    rec = bench._make_record(
        imgs_per_sec=120.0, model_ms=[60.0, 62.0, 61.0], post_ms=[40.0],
        calibration_s=0.028, iters=10, trans_ms=[19.0])
    for key in ("metric", "value", "unit", "vs_baseline", "transfer_ms",
                "model_ms", "postproc_ms", "model_tflops", "model_mfu",
                "link_mbps", "calibration_ms", "batch", "iters", "input"):
        assert key in rec, key
    assert rec["value"] == 120.0
    assert rec["unit"] == "images/sec/chip"
    assert rec["vs_baseline"] == pytest.approx(120.0 / 24.0, abs=1e-3)
    assert rec["model_ms"] == 61.0                       # median
    # MFU derives from the analytic program FLOPs at the median forward.
    tflops = bench.FORWARD_TFLOP_PER_BATCH / (61.0 / 1e3)
    assert rec["model_tflops"] == pytest.approx(tflops, abs=0.05)
    assert rec["model_mfu"] == pytest.approx(tflops / bench.V5E_PEAK_TFLOPS,
                                             abs=1e-3)
    assert rec["batch"] == bench.BATCH


def test_make_record_zero_model_ms_is_safe():
    # The crash/SIGTERM path emits records before stage attribution exists.
    rec = bench._make_record(50.0, [0.0], [0.0], 0.0, 2)
    assert rec["model_tflops"] == 0.0
    assert rec["model_mfu"] == 0.0


def test_physics_guards_are_first_principles():
    # Forward floor: 5.018 TFLOP at the 197-TFLOPS chip peak.
    assert bench.MIN_MODEL_MS == pytest.approx(5.018 / 197.0 * 1e3, rel=1e-6)
    # A batch-16 forward can never beat ~25 ms on one v5e chip.
    assert 25.0 < bench.MIN_MODEL_MS < 26.0
    # Pipelined e2e ceiling: max(compute floor, transfer floor), not sum.
    assert bench.MIN_BATCH_PERIOD_S == pytest.approx(
        max(bench.FORWARD_TFLOP_PER_BATCH / bench.V5E_PEAK_TFLOPS,
            bench.I420_BYTES_PER_BATCH / bench.MAX_LINK_BYTES_PER_SEC))
    assert 600 < bench.REPLAY_SUSPECT_IMGS_PER_SEC < 660
    # The re-roll bar sits far below the ceiling (it gates grant quality,
    # not physics) and above the A100 baseline.
    assert (bench.A100_REFERENCE_IMGS_PER_SEC
            < bench.REROLL_IMGS_PER_SEC
            < bench.REPLAY_SUSPECT_IMGS_PER_SEC)


def test_i420_wire_size():
    # 1.5 bytes/pixel at 512x832, batch 16 -> ~10.2 MB over the link.
    assert bench.I420_BYTES_PER_BATCH == 16 * 512 * 832 * 3 // 2


def test_train_bench_record_schema():
    table = {
        "b=2": {"ms_per_step": 110.0, "imgs_per_sec": 18.0,
                "tflops": 20.0, "mfu": 0.10},
        "b=8": {"ms_per_step": 240.0, "imgs_per_sec": 33.3,
                "tflops": 37.0, "mfu": 0.19},
    }
    rec = bench_train._record(table, calibration_s=0.03)
    assert rec["unit"] == "images/sec/chip"
    assert rec["value"] == 33.3          # best row is the headline
    assert rec["per_batch"]["b=2"]["imgs_per_sec"] == 18.0
    assert rec["train_tflop_per_img"] == bench_train.TRAIN_TFLOP_PER_IMG
    # An empty table (SIGTERM before any row) still emits a record.
    assert bench_train._record({}, 0.0)["value"] == 0.0
    # Physical floor: ~5.67 ms/img for fwd+bwd+Adam at chip peak.
    assert 5.0 < bench_train.MIN_MS_PER_IMG < 6.5


def test_sparsify_variables_zeroes_only_2d_head_scales():
    """The sparse-scene setup must zero EXACTLY the 2D-head output BN
    scales: zeroing depth-head scales too would blind the replay
    detector's forward-content probe (all maps identically zero for any
    input), and missing any 2D head would leave the synthetic crowd on
    the 127 rung (perf_notes 'Round-4 headline bench')."""
    ones = np.ones((4,), np.float32)
    variables = {"params": {
        "stage2": {
            "up": {
                "up3": {
                    "res_conv2": {"bn": {"scale": ones, "bias": ones},
                                  "conv": {"kernel": ones}},
                    "res_d_conv2": {"bn": {"scale": ones}},
                    "res_rd_conv2": {"bn": {"scale": ones}},
                    "res_conv1": {"bn": {"scale": ones}},
                },
            },
        },
    }}
    out = bench.sparsify_variables(variables)
    unit = out["params"]["stage2"]["up"]["up3"]
    assert np.all(unit["res_conv2"]["bn"]["scale"] == 0.0)
    # Everything else — depth-head scales, the 2D head's own bias/kernel,
    # the head's first conv — is untouched.
    assert np.all(unit["res_conv2"]["bn"]["bias"] == 1.0)
    assert np.all(unit["res_conv2"]["conv"]["kernel"] == 1.0)
    assert np.all(unit["res_d_conv2"]["bn"]["scale"] == 1.0)
    assert np.all(unit["res_rd_conv2"]["bn"]["scale"] == 1.0)
    assert np.all(unit["res_conv1"]["bn"]["scale"] == 1.0)


def test_bench_modules_reimport_without_device_work():
    # bench.py re-execs itself for grant re-rolls and reloads all modules
    # from disk; importing the bench modules must stay device-free (jax is
    # imported lazily inside functions), so a plain reload succeeds even
    # when no backend is reachable.
    importlib.reload(bench)
    importlib.reload(bench_train)
    assert bench.BATCH == 16 and bench_train.PEAK_TFLOPS == 197.0
