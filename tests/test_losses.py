"""Loss parity vs. the reference torch implementations (lib/utils/loss_h.py)."""

import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

torch = pytest.importorskip("torch")

from lib.utils.loss_h import DepthLoss, JointsL2Loss  # noqa: E402


@pytest.mark.parametrize("ohkm,paf_num", [(False, 0), (True, 0), (True, 14)])
def test_joints_l2_loss(rng, ohkm, paf_num):
    import jax.numpy as jnp
    from smap_tpu.losses import joints_l2_loss

    B, C, H, W = 3, 43 if paf_num else 14, 16, 24
    out = rng.randn(B, C, H, W).astype(np.float32)
    lbl = rng.randn(B, C, H, W).astype(np.float32)
    valid = (rng.rand(B, C, 1) > 0.3).astype(np.float32)

    ref_mod = JointsL2Loss(has_ohkm=ohkm, topk=8, paf_num=paf_num)
    ref = ref_mod(torch.from_numpy(out), torch.from_numpy(valid),
                  torch.from_numpy(lbl)).item()
    got = joints_l2_loss(jnp.asarray(out.transpose(0, 2, 3, 1)),
                         jnp.asarray(valid[..., 0]),
                         jnp.asarray(lbl.transpose(0, 2, 3, 1)),
                         ohkm=ohkm, topk=8, paf_num=paf_num)
    np.testing.assert_allclose(float(got), ref, rtol=1e-5)


def test_depth_loss(rng):
    import jax.numpy as jnp
    from smap_tpu.losses import depth_loss

    B, H, W, P = 2, 16, 24, 20
    out = rng.randn(B, 1, H, W).astype(np.float32)
    rdepth = np.zeros((B, P, 3), np.float32)
    for b in range(B):
        n = rng.randint(1, 6)
        rdepth[b, :n, 0] = rng.randint(0, H, n)
        rdepth[b, :n, 1] = rng.randint(0, W, n)
        rdepth[b, :n, 2] = rng.rand(n) * 3

    ref = DepthLoss()(torch.from_numpy(out),
                      torch.from_numpy(rdepth)).item()
    got = depth_loss(jnp.asarray(out.transpose(0, 2, 3, 1)),
                     jnp.asarray(rdepth))
    np.testing.assert_allclose(float(got), ref, rtol=1e-5)


def test_depth_loss_no_valid(rng):
    import jax.numpy as jnp
    from smap_tpu.losses import depth_loss

    out = rng.randn(2, 1, 8, 8).astype(np.float32)
    rdepth = np.zeros((2, 20, 3), np.float32)
    got = depth_loss(jnp.asarray(out.transpose(0, 2, 3, 1)),
                     jnp.asarray(rdepth))
    assert float(got) == 0.0


@pytest.mark.slow
def test_full_smap_loss_parity(rng):
    """Full multi-stage loss vs. reference SMAP._calculate_loss."""
    import types

    import jax.numpy as jnp

    from smap_tpu.config import TrainConfig
    from smap_tpu.losses import smap_loss

    sys.path.insert(0, REFERENCE)
    from model.smap import SMAP as TorchSMAP

    class NS(types.SimpleNamespace):
        pass

    cfg = NS()
    cfg.MODEL = NS(STAGE_NUM=3, UPSAMPLE_CHANNEL_NUM=256)
    cfg.DATASET = NS(KEYPOINT=NS(NUM=15), PAF=NS(NUM=14))
    cfg.OUTPUT_SHAPE = (16, 26)
    cfg.LOSS = NS(OHKM=True, TOPK=8, COARSE_TO_FINE=True)
    tmodel = TorchSMAP(cfg)

    B, H, W = 2, 16, 26
    outputs_t = {"heatmap_2d": [], "det_d": [], "root_d": []}
    outputs_j = {"heatmap_2d": [], "det_d": [], "root_d": []}
    for s in range(3):
        r, d, rd = [], [], []
        rj, dj, rdj = [], [], []
        for k in range(4):
            a = rng.randn(B, 43, H, W).astype(np.float32)
            b = rng.randn(B, 14, H, W).astype(np.float32)
            c = rng.randn(B, 1, H, W).astype(np.float32)
            r.append(torch.from_numpy(a))
            d.append(torch.from_numpy(b))
            rd.append(torch.from_numpy(c))
            rj.append(jnp.asarray(a.transpose(0, 2, 3, 1)))
            dj.append(jnp.asarray(b.transpose(0, 2, 3, 1)))
            rdj.append(jnp.asarray(c.transpose(0, 2, 3, 1)))
        outputs_t["heatmap_2d"].append(r)
        outputs_t["det_d"].append(d)
        outputs_t["root_d"].append(rd)
        outputs_j["heatmap_2d"].append(rj)
        outputs_j["det_d"].append(dj)
        outputs_j["root_d"].append(rdj)

    labels = rng.randn(B, 5, 57, H, W).astype(np.float32)
    valids = (rng.rand(B, 57, 1) > 0.2).astype(np.float32)
    rdepth = np.zeros((B, 20, 3), np.float32)
    rdepth[:, :3, 0] = rng.randint(0, H, (B, 3))
    rdepth[:, :3, 1] = rng.randint(0, W, (B, 3))
    rdepth[:, :3, 2] = rng.rand(B, 3)

    ref = tmodel._calculate_loss(outputs_t, torch.from_numpy(valids),
                                 torch.from_numpy(labels),
                                 torch.from_numpy(rdepth))
    got = smap_loss(outputs_j, jnp.asarray(valids[..., 0]),
                    jnp.asarray(labels.transpose(0, 1, 3, 4, 2)),
                    jnp.asarray(rdepth), TrainConfig())
    for key in ["total_loss", "loss_2d", "loss_bone", "loss_root"]:
        np.testing.assert_allclose(float(got[key]), ref[key].item(),
                                   rtol=2e-5, err_msg=key)
