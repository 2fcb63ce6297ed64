"""SMAP model parity vs. the reference PyTorch implementation.

The reference repo (read-only, /root/reference) is imported as a *test
oracle*: we instantiate its torch model with random weights, convert the
state_dict with smap_tpu.models.torch_convert, and check our Flax forward
matches to float32 tolerance. No reference code is vendored.
"""

import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"


def _load_reference_smap():
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from model.smap import SMAP as TorchSMAP  # noqa: E402

    class _NS(types.SimpleNamespace):
        pass

    cfg = _NS()
    cfg.MODEL = _NS(STAGE_NUM=3, UPSAMPLE_CHANNEL_NUM=256)
    cfg.DATASET = _NS(KEYPOINT=_NS(NUM=15), PAF=_NS(NUM=14))
    cfg.OUTPUT_SHAPE = (64, 104)  # half-size for test speed
    cfg.LOSS = _NS(OHKM=True, TOPK=8, COARSE_TO_FINE=True)
    model = TorchSMAP(cfg)
    model.eval()
    return torch, model


@pytest.mark.slow
def test_smap_forward_parity():
    torch, torch_model = _load_reference_smap()

    import jax
    import jax.numpy as jnp

    from smap_tpu.config import ModelConfig
    from smap_tpu.models.smap import SMAP
    from smap_tpu.models.torch_convert import convert_smap_state_dict

    cfg = ModelConfig(output_shape=(64, 104), compute_dtype="float32")
    model = SMAP(cfg)

    variables = convert_smap_state_dict(torch_model.state_dict())
    variables = jax.tree.map(jnp.asarray, variables)

    rng = np.random.RandomState(0)
    # Small input: 256x416 -> stem/4 = 64x104 feature maps.
    img = rng.randn(1, 3, 256, 416).astype(np.float32)

    with torch.no_grad():
        t2d, t3d, trd = torch_model(torch.from_numpy(img))

    j2d, j3d, jrd = model.apply(variables, jnp.asarray(img.transpose(0, 2, 3, 1)),
                                method=SMAP.infer)
    # NHWC -> NCHW for comparison.
    j2d = np.moveaxis(np.asarray(j2d), -1, 1)
    j3d = np.moveaxis(np.asarray(j3d), -1, 1)
    jrd = np.moveaxis(np.asarray(jrd), -1, 1)

    for name, a, b in [("2d", t2d.numpy(), j2d),
                       ("3d", t3d.numpy(), j3d),
                       ("rd", trd.numpy(), jrd)]:
        scale = max(1.0, np.abs(a).max())
        err = np.abs(a - b).max() / scale
        assert err < 2e-4, f"{name}: relative max-abs diff {err}"


@pytest.mark.slow
def test_smap_forward_parity_full_resolution():
    """Production-resolution parity gate (512x832, 3 stages): float32 must
    match the torch reference to fp tolerance and the deployment bfloat16
    path must stay within bf16 accumulation error of it.

    The in-env proxy for pretrained-checkpoint parity (no .pth model zoo is
    downloadable here): same architecture, same converted weights, full
    production shapes (reference: exps/stage3_root2/test.py:190-212 with
    INPUT_SHAPE=(512,832), data_settings.py:39-41).
    """
    torch, torch_model = _load_reference_torch_full()

    import jax
    import jax.numpy as jnp

    from smap_tpu.config import ModelConfig
    from smap_tpu.models.smap import SMAP
    from smap_tpu.models.torch_convert import convert_smap_state_dict

    variables = jax.tree.map(
        jnp.asarray, convert_smap_state_dict(torch_model.state_dict()))

    rng = np.random.RandomState(1)
    img = rng.randn(1, 3, 512, 832).astype(np.float32)

    with torch.no_grad():
        t2d, t3d, trd = torch_model(torch.from_numpy(img))
    refs = {"2d": t2d.numpy(), "3d": t3d.numpy(), "rd": trd.numpy()}

    nhwc = jnp.asarray(img.transpose(0, 2, 3, 1))
    # bf16 tolerance calibrated on the worst head (root-depth, whose values
    # sit near zero so the error is effectively absolute): measured 0.068
    # with random weights across the 3-stage bf16 accumulation.
    for dtype, tol in (("float32", 5e-4), ("bfloat16", 1e-1)):
        model = SMAP(ModelConfig(output_shape=(128, 208),
                                 compute_dtype=dtype))
        outs = jax.jit(
            lambda v, x: model.apply(v, x, method=SMAP.infer))(variables,
                                                               nhwc)
        for name, got in zip(("2d", "3d", "rd"), outs):
            a = refs[name]
            b = np.moveaxis(np.asarray(got, np.float32), -1, 1)
            scale = max(1.0, np.abs(a).max())
            err = np.abs(a - b).max() / scale
            assert err < tol, f"{dtype}/{name}: relative max-abs diff {err}"


def _load_reference_torch_full():
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from model.smap import SMAP as TorchSMAP

    class _NS(types.SimpleNamespace):
        pass

    cfg = _NS()
    cfg.MODEL = _NS(STAGE_NUM=3, UPSAMPLE_CHANNEL_NUM=256)
    cfg.DATASET = _NS(KEYPOINT=_NS(NUM=15), PAF=_NS(NUM=14))
    cfg.OUTPUT_SHAPE = (128, 208)   # production resolution
    cfg.LOSS = _NS(OHKM=True, TOPK=8, COARSE_TO_FINE=True)
    model = TorchSMAP(cfg)
    model.eval()
    return torch, model


@pytest.mark.slow
def test_converter_roundtrip_shapes():
    """Converter produces a tree that apply() accepts (no torch needed)."""
    import jax
    import jax.numpy as jnp

    from smap_tpu.config import ModelConfig
    from smap_tpu.models.smap import SMAP

    cfg = ModelConfig(output_shape=(32, 52), compute_dtype="float32")
    model = SMAP(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 208, 3), jnp.float32))
    out2d, out3d, outrd = model.apply(
        variables, jnp.zeros((1, 128, 208, 3)), method=SMAP.infer)
    assert out2d.shape == (1, 32, 52, 43)
    assert out3d.shape == (1, 32, 52, 14)
    assert outrd.shape == (1, 32, 52, 1)


def test_export_smap_state_dict_roundtrip():
    """torch state_dict -> our variables -> exported state_dict is
    bit-identical (incl. num_batches_tracked zeros), so TPU-trained
    checkpoints load back into the reference model."""
    torch, torch_model = _load_reference_smap()
    from smap_tpu.models.torch_convert import (convert_smap_state_dict,
                                               export_smap_state_dict)

    sd = {k: v for k, v in torch_model.state_dict().items()}
    variables = convert_smap_state_dict(sd)
    back = export_smap_state_dict(variables)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k].detach().cpu().numpy(),
                                      err_msg=k)


def test_export_refinenet_state_dict_roundtrip():
    torch = pytest.importorskip("torch")
    torch.manual_seed(1)
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from model.refinenet import RefineNet as TorchRefine  # noqa: E402

    from smap_tpu.models.torch_convert import (convert_refinenet_state_dict,
                                               export_refinenet_state_dict)

    tmodel = TorchRefine()
    tmodel.eval()
    sd = {k: v for k, v in tmodel.state_dict().items()}
    variables = convert_refinenet_state_dict(sd)
    back = export_refinenet_state_dict(variables)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k].detach().cpu().numpy(),
                                      err_msg=k)


def test_refinenet_parity():
    """RefineNet forward parity vs the reference torch module."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from model.refinenet import RefineNet as TorchRefineNet

    import jax
    import jax.numpy as jnp

    from smap_tpu.models.refinenet import RefineNet
    from smap_tpu.models.torch_convert import convert_refinenet_state_dict

    tmodel = TorchRefineNet()
    tmodel.eval()
    variables = jax.tree.map(
        jnp.asarray, convert_refinenet_state_dict(tmodel.state_dict()))

    rng = np.random.RandomState(0)
    x = rng.randn(8, 75).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    got = np.asarray(RefineNet().apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=1e-5)
