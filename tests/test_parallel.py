"""Mesh-sharding correctness on the 8-virtual-device CPU mesh.

VERDICT round 1, item 10: a halo-exchange proof beyond the training dryrun —
the spatially-sharded inference pipeline must produce bit-identical class
maps vs a single device.
"""
import numpy as np
import pytest

import jax


def _small_high_res_cfg():
    """high_res_roi preset (rotate90 + normalize + custom ROI) scaled down so
    the CPU-mesh test compiles fast; all structural stages preserved."""
    from unet_tpu.pipeline import get_preset
    from unet_tpu.pipeline.config import ROI, PreprocessCfg

    cfg = get_preset("high_res_roi")
    return cfg.replace(
        preprocess=PreprocessCfg(rotate90_ccw=True, normalize_wh=(96, 64),
                                 model_size=(32, 32)),
        roi=ROI(30, 0, 66, 64, space=(96, 64)),
    )


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_spatial_sharded_pipeline_matches_single_device(rng):
    from unet_tpu import parallel
    from unet_tpu.models import NestedUNet
    from unet_tpu.pipeline import stages

    cfg = _small_high_res_cfg()
    model = NestedUNet(num_classes=3, deep_supervision=True)
    import jax.numpy as jnp
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                           train=False)

    frames = (rng.random((4, 256, 192, 3)) * 255).astype(np.uint8)

    ref = stages.build_step(model, cfg)(variables, frames)

    mesh = parallel.make_mesh(n_data=2, n_spatial=2,
                              devices=jax.devices()[:4])
    sharded = parallel.shard_pipeline_step(
        lambda v, f: stages.run_pipeline(v, f, model=model, cfg=cfg),
        mesh, spatial=True)
    out = sharded(variables, frames)

    # class decisions and pixel counts must be exact; XLA's halo exchange is
    # semantically invisible
    np.testing.assert_array_equal(np.asarray(out.class_map),
                                  np.asarray(ref.class_map))
    for field in ("cable_px", "tape_px", "burr_px"):
        np.testing.assert_array_equal(np.asarray(getattr(out, field)),
                                      np.asarray(getattr(ref, field)))
    if ref.diameters is not None:
        np.testing.assert_allclose(np.asarray(out.diameters.delta_d_px),
                                   np.asarray(ref.diameters.delta_d_px),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_data_sharded_pipeline_matches_single_device(rng):
    """Pure data-axis sharding (the multi-stream serving path) must also be
    output-identical."""
    from unet_tpu import parallel
    from unet_tpu.models import NestedUNet
    from unet_tpu.pipeline import get_preset, stages
    from unet_tpu.pipeline.config import PreprocessCfg

    import jax.numpy as jnp

    cfg = get_preset("two_stage").replace(
        preprocess=PreprocessCfg(model_size=(32, 32)))
    model = NestedUNet(num_classes=3, deep_supervision=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                           train=False)
    frames = (rng.random((8, 48, 64, 3)) * 255).astype(np.uint8)

    ref = stages.build_step(model, cfg)(variables, frames)
    mesh = parallel.make_mesh(n_data=4, n_spatial=2)
    sharded = parallel.shard_pipeline_step(
        lambda v, f: stages.run_pipeline(v, f, model=model, cfg=cfg), mesh)
    out = sharded(variables, frames)
    np.testing.assert_array_equal(np.asarray(out.class_map),
                                  np.asarray(ref.class_map))
    np.testing.assert_array_equal(np.asarray(out.burr_px),
                                  np.asarray(ref.burr_px))
