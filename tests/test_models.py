"""Model structure, conv/BN/padding parity, weight importer round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bayesian_yolov3_tpu.config import Config
from bayesian_yolov3_tpu.core.blueprint import Variant, VariantSpec
from bayesian_yolov3_tpu.core.priors import ECP_9_PRIORS, priors_as_array
from bayesian_yolov3_tpu.models import darknet, yolov3
from bayesian_yolov3_tpu.ops import common

IMG = (64, 96, 3)


def _model(variant):
    return yolov3.YoloV3(
        spec=VariantSpec(Variant(variant), 2),
        priors=ECP_9_PRIORS,
        img_size=IMG,
    )


@pytest.mark.parametrize("variant,chpp", [("standard", 7), ("aleatoric", 14), ("bayesian", 14)])
def test_forward_shapes_match_blueprint(variant, chpp):
    m = _model(variant)
    params, stats = m.init(jax.random.PRNGKey(0))
    imgs = jnp.zeros((2, *IMG), jnp.float32)
    rng = jax.random.PRNGKey(1) if variant == "bayesian" else None
    raws, _ = m.forward(params, stats, imgs, training=False, rng=rng)
    for raw, scale_bp in zip(raws, m.blueprint.det_scales):
        assert raw.shape == (2, scale_bp.h, scale_bp.w, 3 * chpp)
    assert m.blueprint.matches(m.blueprint.det_scales, 2)


def test_darknet_stride2_padding_matches_tf():
    """Darknet/caffe asymmetric pad (reference layers.py:616-635) vs TF oracle."""
    tf = pytest.importorskip("tensorflow")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 8, 10, 4)).astype(np.float32)
    w = rng.standard_normal((3, 3, 4, 6)).astype(np.float32)

    got = np.asarray(common.conv2d(jnp.asarray(x), jnp.asarray(w), stride=2))

    xt = tf.pad(x, [[0, 0], [1, 1], [1, 1], [0, 0]])
    want = tf.nn.conv2d(xt, w, strides=2, padding="VALID").numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # and explicitly differs from TF 'SAME' on even inputs
    same = tf.nn.conv2d(x, w, strides=2, padding="SAME").numpy()
    assert not np.allclose(got, same)


def test_conv_block_inference_matches_tf():
    tf = pytest.importorskip("tensorflow")
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 6, 6, 3)).astype(np.float32)
    p, s = common.init_conv_block(jax.random.PRNGKey(0), 3, 3, 8)
    p = {k: jnp.asarray(rng.standard_normal(v.shape).astype(np.float32)) for k, v in p.items()}
    s = {
        "mean": jnp.asarray(rng.standard_normal(8).astype(np.float32)),
        "var": jnp.asarray(rng.uniform(0.5, 2.0, 8).astype(np.float32)),
    }
    got, _ = common.conv_block(p, s, jnp.asarray(x), training=False)

    y = tf.nn.conv2d(x, np.asarray(p["w"]), strides=1, padding="SAME")
    y = tf.nn.batch_normalization(
        y, np.asarray(s["mean"]), np.asarray(s["var"]),
        np.asarray(p["beta"]), np.asarray(p["gamma"]), 1e-5,
    )
    want = tf.nn.leaky_relu(y, alpha=0.1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_upsample2x_matches_tf_nearest():
    tf = pytest.importorskip("tensorflow")
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 3, 5, 2)).astype(np.float32)
    got = np.asarray(common.upsample2x(jnp.asarray(x)))
    want = tf.image.resize(x, (6, 10), method="nearest").numpy()
    np.testing.assert_array_equal(got, want)


def test_darknet_weight_importer_roundtrip(tmp_path):
    params, stats = darknet.init_darknet53(jax.random.PRNGKey(0))
    blob = darknet.export_darknet53_weights(params, stats)
    f = tmp_path / "darknet53.conv.74"
    f.write_bytes(blob)
    p2, s2 = darknet.load_darknet53_weights(str(f), params, stats)
    for name in params:
        for k in params[name]:
            np.testing.assert_array_equal(np.asarray(params[name][k]), np.asarray(p2[name][k]))
        for k in stats[name]:
            np.testing.assert_array_equal(np.asarray(stats[name][k]), np.asarray(s2[name][k]))


def test_mc_forward_samples_differ_and_are_reproducible():
    m = _model("bayesian")
    params, stats = m.init(jax.random.PRNGKey(0))
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, *IMG)).astype(np.float32))
    raws = m.mc_forward(params, stats, img, T=3, rng=jax.random.PRNGKey(7))
    assert raws[0].shape[0] == 3
    # samples differ (dropout active)
    assert not np.allclose(np.asarray(raws[0][0]), np.asarray(raws[0][1]))
    # same key -> identical
    raws2 = m.mc_forward(params, stats, img, T=3, rng=jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(raws[0]), np.asarray(raws2[0]))


def test_standard_test_dropout_disables_dropout():
    m = _model("bayesian")
    params, stats = m.init(jax.random.PRNGKey(0))
    img = jnp.ones((1, *IMG), jnp.float32) * 0.5
    r1, _ = m.forward(params, stats, img, rng=jax.random.PRNGKey(1), standard_test_dropout=True)
    r2, _ = m.forward(params, stats, img, rng=jax.random.PRNGKey(2), standard_test_dropout=True)
    np.testing.assert_array_equal(np.asarray(r1[0]), np.asarray(r2[0]))


def test_config_blueprint_and_crop_priors():
    cfg = Config(model="bayesian", crop=True,
                 full_img_size=(1024, 1920, 3), crop_img_size=(768, 1440, 3))
    bp = cfg.blueprint()
    assert [s.downsample for s in bp.det_scales] == [32, 16, 8]
    assert bp.det_scales[0].h == 768 // 32 and bp.det_scales[0].w == 1440 // 32
    # priors rescaled by full/crop ratio (reference model.py:10-15)
    base = priors_as_array(ECP_9_PRIORS)[32]
    got = priors_as_array(cfg.resolved_priors())[32]
    np.testing.assert_allclose(got[:, 0], base[:, 0] * 1024 / 768, rtol=1e-6)
    np.testing.assert_allclose(got[:, 1], base[:, 1] * 1920 / 1440, rtol=1e-6)


def test_fast_stem_matches_plain_backbone(rng):
    """The space-to-depth stem (conv1 + stride-2 conv2 folded into dense
    s2d-domain convs, models/darknet.py:_stem_kernels) must compute the
    SAME function as the plain path — checked through the entire backbone
    with randomized BN statistics so the affine isn't identity."""
    params, stats = darknet.init_darknet53(jax.random.PRNGKey(3))
    for i in range(2):
        n = darknet._conv_name(i)
        c = params[n]["gamma"].shape[0]
        params[n]["gamma"] = jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32)
        params[n]["beta"] = jnp.asarray(rng.normal(0, 0.2, c), jnp.float32)
        stats[n]["mean"] = jnp.asarray(rng.normal(0, 0.2, c), jnp.float32)
        stats[n]["var"] = jnp.asarray(rng.uniform(0.5, 2.0, c), jnp.float32)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 96, 3)), jnp.float32)
    fast = darknet.darknet53(params, stats, x, training=False, fast_stem=True)
    plain = darknet.darknet53(params, stats, x, training=False, fast_stem=False)
    for a, b, name in zip(fast[:3], plain[:3], ("out32", "skip16", "skip8")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4, err_msg=name
        )


def test_training_mode_backbone_keeps_plain_stem():
    """Batch-stat BN (unfrozen backbone training) must bypass the fast stem
    — the folded path has no per-phase batch-stat reduction.  Moving
    statistics must advance for conv_00/conv_01 exactly as the plain path
    computes them."""
    params, stats = darknet.init_darknet53(jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (2, 64, 96, 3)), jnp.float32
    )
    _, _, _, ns_fast_flag = darknet.darknet53(
        params, stats, x, training=True, fast_stem=True
    )
    _, _, _, ns_plain = darknet.darknet53(
        params, stats, x, training=True, fast_stem=False
    )
    for i in range(2):
        n = darknet._conv_name(i)
        # training=True forces the plain path even with fast_stem=True
        np.testing.assert_allclose(
            np.asarray(ns_fast_flag[n]["mean"]), np.asarray(ns_plain[n]["mean"]),
            rtol=1e-6,
        )
        assert not np.allclose(
            np.asarray(ns_fast_flag[n]["mean"]), np.asarray(stats[n]["mean"])
        )
