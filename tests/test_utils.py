"""Tests for alignment and timer utilities."""

import numpy as np


def test_align_exact_and_suffix(rng):
    from smap_tpu.utils.align import align_and_update

    target = {"stage0": {"conv": {"kernel": np.zeros((3, 3, 4, 8))}},
              "head": {"bias": np.zeros((8,))}}
    loaded = {"backbone": {"stage0": {"conv": {"kernel":
                                               rng.randn(3, 3, 4, 8)}}},
              "other": {"bias": rng.randn(3)}}
    out, missing = align_and_update(target, loaded)
    np.testing.assert_array_equal(
        out["stage0"]["conv"]["kernel"],
        loaded["backbone"]["stage0"]["conv"]["kernel"])
    assert missing == ["head/bias"]          # shape mismatch -> kept


def test_align_shape_guard(rng):
    from smap_tpu.utils.align import align_and_update

    target = {"w": np.zeros((4, 4))}
    loaded = {"w": rng.randn(2, 2)}
    out, missing = align_and_update(target, loaded)
    assert missing == ["w"]
    np.testing.assert_array_equal(out["w"], np.zeros((4, 4)))


def test_timer():
    import time

    from smap_tpu.utils.timer import Timer

    t = Timer()
    with t.section("a"):
        time.sleep(0.01)
    with t.section("a"):
        pass
    assert t.counts["a"] == 2
    assert t.totals["a"] >= 0.01
    assert "a:" in t.summary()


def test_profiling_trace_capture(tmp_path):
    """jax.profiler integration: a trace context writes an xplane capture;
    inert when no dir is configured."""
    import jax
    import jax.numpy as jnp

    from smap_tpu.utils.profiling import StepWindowProfiler, trace

    with trace(None):     # no-op path
        pass

    log_dir = tmp_path / "prof"
    with trace(str(log_dir)):
        jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    files = list(log_dir.rglob("*.xplane.pb"))
    assert files, "no trace written"

    # window profiler: inert without a dir, balanced start/stop with one
    prof = StepWindowProfiler("", first_step=1, num_steps=1)
    for it in range(3):
        prof.step(it)
    prof.close()
    prof = StepWindowProfiler(str(tmp_path / "prof2"), first_step=1,
                              num_steps=1)
    for it in range(3):
        prof.step(it)
        jax.block_until_ready(jnp.ones((4,)) + 1)
    prof.close()
    assert list((tmp_path / "prof2").rglob("*.xplane.pb"))

    # steps-per-execution windows: first_step=10 falls INSIDE the window
    # ending at it=12 (window=4 covers 9..12), so the capture still starts
    # (a plain it == first_step check would never fire for k>1 cadences).
    prof = StepWindowProfiler(str(tmp_path / "prof3"), first_step=10,
                              num_steps=4)
    for it in (4, 8, 12, 16):
        prof.step(it, window=4)
        jax.block_until_ready(jnp.ones((4,)) + 1)
    prof.close()
    assert list((tmp_path / "prof3").rglob("*.xplane.pb"))
