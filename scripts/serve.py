"""Streaming serving loop: image/video frames -> 3D poses as JSON lines.

The production serving shape of the framework (the reference has no
serving entry point; its closest analogue is `run_inference` over a
directory, exps/stage3_root2/test.py:156-178):

* frames come from an image directory (optionally polled with --watch)
  or a video file (anything cv2.VideoCapture opens);
* frames are letterboxed on host and shipped as packed planar I420
  (YUV 4:2:0, the video wire format — 1.5 bytes/pixel over the
  host->device link, converted + normalized on device);
* batches run through SMAPInference.run_stream: while batch i executes
  on device, batch i+1's transfer and dispatches are already enqueued,
  so steady-state throughput is the device pipeline rate, not
  transfer + compute + postproc in series; idle polls flush the
  in-flight slot so watch-mode latency stays bounded;
* post-processing runs at an adaptive peak capacity (the smallest
  compiled program that fits each batch's scenes);
* results stream out as one JSON line per image (same `3d_pairs` item
  schema as the batch CLIs), flushed per batch.

Usage:
  python scripts/serve.py --source /path/imgs -p SMAP.pth --out poses.jsonl
  # keep polling the directory for new frames:
  python scripts/serve.py --source /path/imgs --watch ... --out -
  # video file:
  python scripts/serve.py --source clip.mp4 --video-stride 2 ... --out -
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def iter_frames(source: str, watch: bool, poll_s: float = 0.5):
    """Yield image paths; in watch mode, keep polling for new ones and
    yield None after an idle poll (lets the caller flush partial
    batches instead of stalling on a quiet source).

    Long-running watch loops stay bounded and safe against half-written
    frames: entries for deleted files are evicted from the dedup set, and
    a file is only yielded once its mtime is at least one poll interval
    old (a frame still being written would otherwise be decoded
    truncated — cv2.imread can return partial data, not None).
    """
    seen = set()
    while True:
        paths = []
        for ext in ("jpg", "png", "jpeg"):
            paths.extend(glob.glob(os.path.join(source, f"**/*.{ext}"),
                                   recursive=True))
        if watch:
            seen &= set(paths)   # evict deleted files; keeps `seen` bounded
        now = time.time()
        fresh = []
        for p in sorted(paths):
            if p in seen:
                continue
            if watch:
                try:
                    # Settled = mtime at least one poll old. Absolute age
                    # (not `now - mtime < poll_s`): a future mtime from a
                    # skewed producer clock must not withhold the frame
                    # until wall-clock time catches up with it.
                    if abs(now - os.stat(p).st_mtime) < poll_s:
                        continue   # possibly still being written; next poll
                except OSError:
                    continue       # vanished between glob and stat
            seen.add(p)
            fresh.append(p)
        yield from fresh
        if not watch:
            return
        if not fresh:
            yield None
        time.sleep(poll_s)


def iter_video_frames(source: str, stride: int = 1):
    """Yield (name, BGR frame) from a video file via cv2.VideoCapture,
    keeping every ``stride``-th frame. Names encode the frame index so
    downstream JSONL rows stay attributable."""
    import cv2

    cap = cv2.VideoCapture(source)
    if not cap.isOpened():
        raise SystemExit(f"cannot open video source: {source}")
    try:
        i = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                return
            if i % stride == 0:
                yield f"{source}#frame{i:06d}", frame
            i += 1
    finally:
        cap.release()


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--source", required=True,
                        help="image directory or video file")
    parser.add_argument("--watch", action="store_true",
                        help="keep polling for new frames (directory only)")
    parser.add_argument("--video-stride", type=int, default=1,
                        help="keep every Nth frame of a video source")
    parser.add_argument("--smap-path", "-p", default="")
    parser.add_argument("--ckpt-dir", default="")
    parser.add_argument("--refine-path", "-rp", default="")
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--adaptive-capacities", default="8,16,40",
                        help="peak-capacity ladder ('' disables)")
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard each batch over all local devices "
                             "(single-process multi-chip serving; batch "
                             "size must be divisible by the device count)")
    parser.add_argument("--int8", action="store_true",
                        help="int8-quantized forward (BN folded, dynamic "
                             "activation quant; small accuracy cost — "
                             "see smap_tpu/models/quantize.py and the "
                             "runtime caveat in docs/perf_notes.md)")
    parser.add_argument("--int8-static", action="store_true",
                        help="int8 forward with STATIC activation scales: "
                             "calibrated once on frames from --calib-dir "
                             "(default: the first batch of --source, which "
                             "must then be a directory); removes the "
                             "per-conv abs-max reductions the dynamic mode "
                             "pays per call")
    parser.add_argument("--calib-dir", default="",
                        help="image directory for --int8-static calibration "
                             "(up to one batch of frames)")
    parser.add_argument("--folded", action="store_true",
                        help="full-precision bf16 serving with BatchNorm "
                             "folded into the conv weights; no quantization "
                             "loss. (The fused Pallas bottleneck kernel "
                             "measured BELOW XLA's lowering and defaults "
                             "off — SMAP_TPU_FUSE_BOTTLENECK=1 re-enables "
                             "for A/B; docs/perf_notes.md round-4)")
    parser.add_argument("--out", default="-",
                        help="output JSONL path ('-' = stdout)")
    args = parser.parse_args()

    from smap_tpu.utils.cache import enable_compilation_cache
    from smap_tpu.utils.runtime import apply_platform_env

    apply_platform_env()

    enable_compilation_cache()

    import cv2
    import numpy as np

    from smap_tpu.config import Config
    from smap_tpu.data.preprocess import bgr_to_i420, letterbox_image
    from smap_tpu.inference import SMAPInference
    from scripts.test_smap import load_smap_variables  # reuse loaders

    cfg = Config()
    variables = load_smap_variables(args, cfg)
    refine_variables = None
    if args.refine_path:
        import jax

        from smap_tpu.models.torch_convert import (
            convert_refinenet_state_dict, load_torch_checkpoint)
        refine_variables = jax.tree.map(
            lambda x: x, convert_refinenet_state_dict(
                load_torch_checkpoint(args.refine_path)))

    import collections

    import jax

    mesh = None
    if args.data_parallel:
        from smap_tpu.parallel.mesh import make_mesh

        if len(jax.local_devices()) > 1:
            mesh = make_mesh(jax.local_devices())

    if sum((args.int8, args.int8_static, args.folded)) > 1:
        raise SystemExit("--int8 / --int8-static / --folded are mutually "
                         "exclusive")
    calibration_batches = None
    quantized = "folded" if args.folded else args.int8
    if args.int8_static:
        calib_dir = args.calib_dir or (
            args.source if os.path.isdir(args.source) else "")
        if not calib_dir:
            raise SystemExit("--int8-static needs --calib-dir (or a "
                             "directory --source to calibrate on)")
        calib_paths = sorted(
            p for ext in ("jpg", "png", "jpeg")
            for p in glob.glob(os.path.join(calib_dir, f"**/*.{ext}"),
                               recursive=True))[:args.batch_size]
        if not calib_paths:
            raise SystemExit(f"no calibration images under {calib_dir}")
        calib = [bgr_to_i420(letterbox_image(
            cv2.imread(p, cv2.IMREAD_COLOR), cfg.input_shape)[0])
            for p in calib_paths]
        calibration_batches = [np.stack(calib)]
        quantized = "static"

    ladder = (tuple(int(c) for c in args.adaptive_capacities.split(","))
              if args.adaptive_capacities else None)
    engine = SMAPInference(variables, cfg, refine_variables,
                           adaptive_capacities=ladder, mesh=mesh,
                           quantized=quantized,
                           calibration_batches=calibration_batches)
    sink = sys.stdout if args.out == "-" else open(args.out, "a")

    if os.path.isdir(args.source):
        def frames():
            """(name, BGR) per frame; None on idle watch polls."""
            for path in iter_frames(args.source, args.watch):
                if path is None:
                    yield None
                    continue
                raw = cv2.imread(path, cv2.IMREAD_COLOR)
                if raw is not None:
                    yield path, raw
    else:
        def frames():
            yield from iter_video_frames(args.source, args.video_stride)

    # run_stream input: batches of (I420 stack, scales), None to flush the
    # in-flight slot on idle. `meta` carries (names, real count) per batch
    # dispatched, consumed in order as results come back.
    meta = collections.deque()

    def batches():
        imgs, names, scales = [], [], []

        def make_batch():
            n = len(imgs)
            batch = imgs + [np.zeros_like(imgs[0])] * (args.batch_size - n)
            sc = scales + [scales[-1]] * (args.batch_size - n)
            meta.append((list(names), n))
            imgs.clear()
            names.clear()
            scales.clear()
            return np.stack(batch), sc

        for item in frames():
            if item is None:     # idle poll: dispatch partials, drain slot
                if imgs:
                    yield make_batch()
                yield None
                continue
            name, raw = item
            img, scale = letterbox_image(raw, cfg.input_shape)
            imgs.append(bgr_to_i420(img))   # 1.5 B/px over the link
            names.append(name)
            scales.append(scale)
            if len(imgs) == args.batch_size:
                yield make_batch()
        if imgs:
            yield make_batch()

    for res in engine.run_stream(batches()):
        names, n = meta.popleft()
        pairs = engine.results_to_pairs(
            jax.tree.map(lambda a: a[:n], res), names)
        for item in pairs:
            sink.write(json.dumps(item) + "\n")
        sink.flush()


if __name__ == "__main__":
    main()
