"""Activation-level parity: Flax models + converted torch weights vs torch.

This is the numerical gate guaranteeing the reference checkpoints
(`checkpoints_3class_advanced/best_model.pth` etc.) produce identical masks
after conversion (SURVEY §7 step 2)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from tests.torch_ref import TNestedUNet, TSimpleUNet
from unet_tpu.models import NestedUNet, SimpleUNet, convert


def _to_numpy_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _randomize_bn_stats(model, gen):
    # make running stats non-trivial so BN parity is actually exercised
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=gen) * 0.2)
            m.running_var.copy_(torch.rand(m.num_features, generator=gen) + 0.5)


def test_nested_unet_eval_parity():
    gen = torch.Generator().manual_seed(0)
    tm = TNestedUNet(num_classes=3, deep_supervision=True).eval()
    _randomize_bn_stats(tm, gen)
    x = torch.randn(2, 3, 64, 64, generator=gen)
    with torch.no_grad():
        want = tm(x).numpy()

    variables = convert.convert_state_dict(_to_numpy_sd(tm))
    fm = NestedUNet(num_classes=3, deep_supervision=True)
    got = fm.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), train=False)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    # f32 conv accumulation order differs between XLA and torch: allow ~1e-3
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)
    # the decision-level contract: identical argmax masks
    assert np.array_equal(got.argmax(1), want.argmax(1))


def test_nested_unet_train_mode_ds_heads():
    gen = torch.Generator().manual_seed(1)
    tm = TNestedUNet(num_classes=3, deep_supervision=True).train()
    x = torch.randn(1, 3, 32, 32, generator=gen)
    with torch.no_grad():
        wants = [o.numpy() for o in tm(x)]

    variables = convert.convert_state_dict(_to_numpy_sd(tm))
    fm = NestedUNet(num_classes=3, deep_supervision=True)
    # run with batch stats updating (train) but compare against torch train
    # mode which normalizes by batch statistics
    outs, _ = fm.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                       train=True, mutable=["batch_stats"])
    assert len(outs) == 4
    for got, want in zip(outs, wants):
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                                   atol=2e-3, rtol=1e-3)


def test_simple_unet_parity():
    gen = torch.Generator().manual_seed(2)
    tm = TSimpleUNet(num_classes=7).eval()
    x = torch.randn(1, 3, 64, 64, generator=gen)
    with torch.no_grad():
        want = tm(x).numpy()

    variables = convert.convert_state_dict(_to_numpy_sd(tm))
    assert convert.detect_model_kind(_to_numpy_sd(tm)) == "simple_unet"
    fm = SimpleUNet(num_classes=7)
    got = fm.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)
    assert np.array_equal(got.argmax(1), want.argmax(1))


def test_checkpoint_container_unwrap(tmp_path):
    tm = TSimpleUNet(num_classes=3)
    path = tmp_path / "ckpt.pth"
    torch.save({"epoch": 5, "model": tm.state_dict(), "best_mIoU": 0.5}, path)
    sd = convert.load_torch_checkpoint(str(path))
    assert "final.weight" in sd
    assert convert.infer_num_classes(sd) == 3


def test_infer_num_classes():
    tm = TNestedUNet(num_classes=5)
    assert convert.infer_num_classes(_to_numpy_sd(tm)) == 5


def test_nested_unet_resnet50_encoder_parity():
    """The reference's resnet50-encoder NestedUNet cannot actually run in
    torch (its stem folds the maxpool so stage0/stage1 share stride 4 and the
    last decoder concat mismatches, reference unetpp.py:56-63 + :116) — so
    parity is asserted at the encoder-stage level, and the repaired Flax
    decoder is checked to run end to end."""
    from tests.torch_ref import TNestedUNetResNet50
    from unet_tpu.models.resnet import ResNet50Encoder
    gen = torch.Generator().manual_seed(3)
    tm = TNestedUNetResNet50(num_classes=3).eval()
    _randomize_bn_stats(tm, gen)
    x = torch.randn(1, 3, 64, 64, generator=gen)
    with torch.no_grad():
        t0 = tm.conv0_0(x)
        t1 = tm.conv1_0(t0)
        t2 = tm.conv2_0(t1)
        t3 = tm.conv3_0(t2)
        t4 = tm.conv4_0(t3)
    wants = [t.numpy() for t in (t0, t1, t2, t3, t4)]

    sd = _to_numpy_sd(tm)
    assert convert.detect_model_kind(sd) == "nested_unet_resnet50"
    variables = convert.convert_state_dict(sd)
    enc = ResNet50Encoder()
    enc_vars = {"params": variables["params"]["encoder"],
                "batch_stats": variables["batch_stats"]["encoder"]}
    feats = enc.apply(enc_vars, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                      train=False)
    for f, want in zip(feats, wants):
        np.testing.assert_allclose(np.asarray(f).transpose(0, 3, 1, 2), want,
                                   atol=2e-3, rtol=1e-3)

    # full forward through the repaired decoder runs and is finite
    fm = NestedUNet(num_classes=3, deep_supervision=False, pretrained_encoder=True)
    out = fm.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                   train=False)
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()
