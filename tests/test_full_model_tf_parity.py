"""Whole-model numerical parity vs an independent TF2 re-implementation.

SURVEY §7 step 3 calls for a parity check against the reference on the
same checkpoint; the TF-1.x reference cannot run on the installed TF2
(tf.contrib), so this test rebuilds the SAME architecture from our weight
pytree with raw TF2 ops (tf.nn.conv2d + batch_normalization + leaky_relu,
darknet padding, nearest upsample, concat skips) and compares the raw
detection outputs of the full standard model end to end.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bayesian_yolov3_tpu.core.blueprint import Variant, VariantSpec
from bayesian_yolov3_tpu.core.priors import ECP_9_PRIORS
from bayesian_yolov3_tpu.models import darknet as dn
from bayesian_yolov3_tpu.models import yolov3 as Y

IMG = (64, 96, 3)


def _tf_conv_block(tf, x, p, s, stride):
    w = np.asarray(p["w"])
    if stride == 2:
        x = tf.pad(x, [[0, 0], [1, 1], [1, 1], [0, 0]])
        y = tf.nn.conv2d(x, w, strides=stride, padding="VALID")
    else:
        y = tf.nn.conv2d(x, w, strides=1, padding="SAME")
    y = tf.nn.batch_normalization(
        y, np.asarray(s["mean"]), np.asarray(s["var"]),
        np.asarray(p["beta"]), np.asarray(p["gamma"]), 1e-5,
    )
    return tf.nn.leaky_relu(y, alpha=0.1)


def _tf_darknet53(tf, params, stats, x):
    i = 0

    def block(h, stride):
        nonlocal i
        name = f"conv_{i:02d}"
        out = _tf_conv_block(tf, h, params[name], stats[name], stride)
        i += 1
        return out

    h = block(x, 1)
    skip8 = skip16 = None
    for cout, blocks in dn._STAGES:
        h = block(h, 2)
        for _ in range(blocks):
            shortcut = h
            h = block(h, 1)
            h = block(h, 1)
            h = h + shortcut
        if i - 1 == dn.SKIP8_IDX:
            skip8 = h
        elif i - 1 == dn.SKIP16_IDX:
            skip16 = h
    return h, skip16, skip8


def _tf_heads(tf, params, stats, dn_out, skip16, skip8):
    raws = []
    x = dn_out
    for head, skip in ((1, None), (2, skip16), (3, skip8)):
        if skip is not None:
            name = f"trans{head - 1}"
            x = _tf_conv_block(tf, x, params[name], stats[name], 1)
            sh = tf.shape(x)
            x = tf.image.resize(x, (2 * sh[1], 2 * sh[2]), method="nearest")
            x = tf.concat([x, skip], axis=-1)
        branch = None
        for j in range(6):
            name = f"head{head}_conv{j}"
            x = _tf_conv_block(tf, x, params[name], stats[name], 1)
            if j == Y._BRANCH_IDX:
                branch = x
        det = params[f"det{head}"]
        raw = tf.nn.conv2d(x, np.asarray(det["w"]), 1, "SAME") + np.asarray(det["b"])
        raws.append(raw)
        x = branch
    return raws


def test_full_standard_model_matches_tf2_reimplementation(rng):
    tf = pytest.importorskip("tensorflow")
    spec = VariantSpec(Variant.STANDARD, 2)
    params, stats = Y.init_yolov3(jax.random.PRNGKey(0), spec)
    img = rng.uniform(0, 1, (1, *IMG)).astype(np.float32)

    got, _ = Y.forward(
        params, stats, jnp.asarray(img), spec=spec, training=False,
        compute_dtype=jnp.float32,
    )

    x = tf.constant(img)
    out32, skip16, skip8 = _tf_darknet53(tf, params["backbone"], stats["backbone"], x)
    want = _tf_heads(tf, params, stats, out32, skip16, skip8)

    for g, w in zip(got, want):
        g, w = np.asarray(g), w.numpy()
        assert g.shape == w.shape
        scale = np.maximum(np.abs(w), 1.0)
        np.testing.assert_allclose(g / scale, w / scale, atol=2e-3)
