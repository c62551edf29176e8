"""Loss parity vs TF kernels and reference reduction semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bayesian_yolov3_tpu.ops import loss as L


def _det_gt(rng, b=2, h=3, w=4, B=3, C=2, aleatoric=True):
    det = {
        "loc": rng.standard_normal((b, h, w, B, 4)).astype(np.float32),
        "obj": rng.standard_normal((b, h, w, B)).astype(np.float32),
        "cls": rng.standard_normal((b, h, w, B, C)).astype(np.float32),
    }
    if aleatoric:
        det["log_loc_var"] = rng.standard_normal((b, h, w, B, 4)).astype(np.float32)
    gt = {
        "loc": rng.standard_normal((b, h, w, B, 4)).astype(np.float32),
        "obj": (rng.uniform(0, 1, (b, h, w, B)) < 0.2).astype(np.float32),
        "cls": rng.integers(0, C, (b, h, w, B)).astype(np.int32),
        "ign": (rng.uniform(0, 1, (b, h, w, B)) < 0.9).astype(np.float32),
    }
    return det, gt


def test_bce_and_softmax_ce_match_tf(rng):
    tf = pytest.importorskip("tensorflow")
    logits = rng.standard_normal((50,)).astype(np.float32) * 3
    labels = (rng.uniform(0, 1, 50) < 0.5).astype(np.float32)
    got = np.asarray(L.sigmoid_bce_with_logits(jnp.asarray(labels), jnp.asarray(logits)))
    want = tf.nn.sigmoid_cross_entropy_with_logits(labels=labels, logits=logits).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    cl = rng.standard_normal((50, 4)).astype(np.float32)
    ci = rng.integers(0, 4, 50).astype(np.int32)
    got = np.asarray(L.sparse_softmax_ce_with_logits(jnp.asarray(ci), jnp.asarray(cl)))
    want = tf.nn.sparse_softmax_cross_entropy_with_logits(labels=ci, logits=cl).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_bce_gradient_correct_at_zero():
    g = jax.grad(lambda x: jnp.sum(L.sigmoid_bce_with_logits(jnp.zeros(3), x)))(
        jnp.zeros(3)
    )
    np.testing.assert_allclose(np.asarray(g), 0.5, rtol=1e-6)


@pytest.mark.parametrize("aleatoric", [False, True])
def test_detection_layer_loss_reductions(rng, aleatoric):
    """Reduction parity: loc sum/(2B); obj/cls sum/B; masks (layers.py:126-188)."""
    det, gt = _det_gt(rng, aleatoric=True)
    got = L.detection_layer_loss(
        {k: jnp.asarray(v) for k, v in det.items()},
        {k: jnp.asarray(v) for k, v in gt.items()},
        aleatoric_loss=aleatoric,
    )
    b = det["loc"].shape[0]
    se = (gt["loc"] - det["loc"]) ** 2
    if aleatoric:
        lv = np.clip(det["log_loc_var"], -40, 40)
        se = se * np.exp(-lv) + lv
    want_loc = np.sum(se * gt["obj"][..., None]) / (2 * b)
    np.testing.assert_allclose(float(got["loc"]), want_loc, rtol=1e-4)

    bce = np.maximum(det["obj"], 0) - det["obj"] * gt["obj"] + np.log1p(
        np.exp(-np.abs(det["obj"]))
    )
    want_obj = np.sum(bce * gt["ign"]) / b
    np.testing.assert_allclose(float(got["obj"]), want_obj, rtol=1e-4)

    logp = det["cls"] - np.log(
        np.sum(np.exp(det["cls"] - det["cls"].max(-1, keepdims=True)), -1, keepdims=True)
    ) - det["cls"].max(-1, keepdims=True)
    ce = -np.take_along_axis(logp, gt["cls"][..., None].astype(int), -1)[..., 0]
    want_cls = np.sum(ce * gt["obj"]) / b
    np.testing.assert_allclose(float(got["cls"]), want_cls, rtol=1e-4)


def test_l2_regularization_scope():
    """conv kernels + det bias regularized; BN params and stats excluded."""
    params = {
        "backbone": {"conv_00": {"w": jnp.ones((3, 3, 3, 4)),
                                 "gamma": jnp.full((4,), 7.0),
                                 "beta": jnp.full((4,), 5.0)}},
        "det1": {"w": jnp.ones((1, 1, 4, 2)), "b": jnp.full((2,), 2.0)},
    }
    got = float(L.l2_regularization(params))
    want = 5e-4 * 0.5 * (3 * 3 * 3 * 4 * 1.0 + 4 * 2 * 1.0 + 2 * 4.0)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_disabled_kendall_losses_run(rng):
    det, gt = _det_gt(rng, b=1, h=2, w=2)
    det["log_obj_stddev"] = rng.standard_normal((1, 2, 2, 3)).astype(np.float32)
    det["log_cls_stddev"] = rng.standard_normal((1, 2, 2, 3, 2)).astype(np.float32)
    detj = {k: jnp.asarray(v) for k, v in det.items()}
    gtj = {k: jnp.asarray(v) for k, v in gt.items()}
    o = L.aleatoric_obj_loss(detj, gtj, jax.random.PRNGKey(0), T=8)
    c = L.aleatoric_cls_loss(detj, gtj, jax.random.PRNGKey(1), T=8)
    assert np.isfinite(np.asarray(o)).all() and np.isfinite(np.asarray(c)).all()
