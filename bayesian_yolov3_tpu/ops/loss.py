"""Training loss: localization + objectness + class, with aleatoric
attenuation and L2 weight regularization.

Numerical parity with lib_yolo/layers.py:126-188 and model.py:197-216:

* localization: squared error ``(gt.loc - det.loc)^2``; when
  ``aleatoric_loss`` it is attenuated Kendall-style with the predicted
  log-variance clipped to [-40, 40]::

      se * exp(-clip(log_var)) + clip(log_var)

  masked by ``gt.obj``; reduced ``sum / (2 * batch)``.
* objectness: sigmoid BCE on logits masked by the ignore mask ``gt.ign``
  (anchors whose prior IoU >= 0.7 with any GT but are not responsible
  contribute nothing); ``sum / batch``.
* class: sparse softmax cross-entropy masked by ``gt.obj``; ``sum / batch``.
* regularization: L2 (``scale * 0.5 * sum(w^2)``, scale 5e-4, model.py:21)
  over conv kernels and detection-head kernels+biases; BN params excluded.

The (disabled) Kendall logit-sampling obj/cls attenuation of the reference
(layers.py:87-123, call sites commented out at :161-163,172-174) is provided
as ``aleatoric_obj_loss`` / ``aleatoric_cls_loss`` for completeness and is
likewise not wired into ``detection_loss``.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

L2_SCALE = 5e-4  # reference model.py:21
LOG_VAR_CLIP = 40.0  # reference layers.py:151


def sigmoid_bce_with_logits(labels, logits):
    """tf.nn.sigmoid_cross_entropy_with_logits, as softplus(x) - x*z.

    Value-identical to TF's max(x,0) - x*z + log1p(exp(-|x|)) but with the
    correct gradient sigmoid(x) - z everywhere (the max/abs form has a
    spurious zero subgradient exactly at x == 0)."""
    return jnp.logaddexp(0.0, logits) - logits * labels


def sparse_softmax_ce_with_logits(labels, logits):
    """tf.nn.sparse_softmax_cross_entropy_with_logits over the last axis.

    TPU note: the label pick is a one-hot contraction, not
    ``take_along_axis`` — per-element gathers lower to serialized loops on
    TPU (CLAUDE.md), and this runs in every training step's loss.  One-hot
    rows select exactly one term (zero terms contribute exact f32 zeros),
    so values and gradients match the gather form at every in-range label;
    out-of-range labels yield 0 instead of a clamped pick (both are masked
    by ``gt['obj']`` in the caller)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    one_hot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logp.dtype)
    return -jnp.sum(one_hot * logp, axis=-1)


def detection_layer_loss(det: Dict, gt: Dict, aleatoric_loss: bool = False) -> Dict:
    """Loss of one detection scale (parity layers.loss_tf, :126-188).

    det: dict of f32 tensors (b, h, w, B, ...) from ops.decode.split_detection
    gt:  dict with 'loc' (b,h,w,B,4), 'obj' (b,h,w,B), 'cls' (b,h,w,B int),
         'ign' (b,h,w,B)
    """
    batch = jnp.asarray(det["loc"].shape[0], jnp.float32)

    loc_loss = (gt["loc"] - det["loc"]) ** 2
    if aleatoric_loss:
        log_var = jnp.clip(det["log_loc_var"], -LOG_VAR_CLIP, LOG_VAR_CLIP)
        loc_loss = loc_loss * jnp.exp(-log_var) + log_var
    loc_loss = loc_loss * gt["obj"][..., None]
    loc = jnp.sum(loc_loss) / (2.0 * batch)

    obj_loss = sigmoid_bce_with_logits(gt["obj"], det["obj"]) * gt["ign"]
    obj = jnp.sum(obj_loss) / batch

    cls_loss = sparse_softmax_ce_with_logits(gt["cls"], det["cls"]) * gt["obj"]
    cls = jnp.sum(cls_loss) / batch

    return {"loc": loc, "obj": obj, "cls": cls}


def l2_regularization(params: Dict) -> jnp.ndarray:
    """0.5 * L2_SCALE * sum of squares over conv kernels (+ det biases).

    Mirrors tf.contrib.layers.l2_regularizer attached to every conv
    (layers.py:550-554, 603-612): conv-block kernels (no bias exists),
    detection-conv kernel and bias; batch-norm gamma/beta excluded.
    Includes frozen backbone kernels, like the reference's
    ``get_regularization_loss`` — they are constant w.r.t. the optimizer.
    """
    return L2_SCALE * 0.5 * _sumsq_conv_params(params)


def _sumsq_conv_params(tree: Dict) -> jnp.ndarray:
    total = jnp.zeros((), jnp.float32)
    for _, block in tree.items():
        if not isinstance(block, dict):
            continue
        if "w" in block or "b" in block:
            for key in ("w", "b"):
                if key in block:
                    total = total + jnp.sum(jnp.square(block[key].astype(jnp.float32)))
        else:
            total = total + _sumsq_conv_params(block)
    return total


def total_loss(
    dets: Sequence[Dict],
    gts: Sequence[Dict],
    params: Dict,
    aleatoric_loss: bool = False,
) -> Tuple[jnp.ndarray, Dict]:
    """Aggregate across the three scales (parity model.py:197-216).

    Returns (total, metrics) with metrics keys matching the reference's
    summaries: loc/obj/cls/detection/l2_weight_reg/total.
    """
    loc = obj = cls = jnp.zeros((), jnp.float32)
    for det, gt in zip(dets, gts):
        l = detection_layer_loss(det, gt, aleatoric_loss)
        loc, obj, cls = loc + l["loc"], obj + l["obj"], cls + l["cls"]
    detection = loc + obj + cls
    reg = l2_regularization(params)
    tot = detection + reg
    return tot, {
        "loc": loc,
        "obj": obj,
        "cls": cls,
        "detection": detection,
        "l2_weight_reg": reg,
        "total": tot,
    }


# --------------------------------------------------------------------------
# Kendall logit-sampling attenuation (implemented-but-disabled in the
# reference, layers.py:87-123) — provided for completeness.
# --------------------------------------------------------------------------


def aleatoric_obj_loss(det: Dict, gt: Dict, rng, T: int = 42):
    stddev = jnp.exp(jnp.clip(det["log_obj_stddev"], -40.0, 40.0))
    eps = jax.random.normal(rng, (T, *det["obj"].shape))
    s = jax.nn.sigmoid(det["obj"][None] + stddev[None] * eps)
    p = jnp.where(gt["obj"][None] > 0.5, s, 1.0 - s)
    return -jnp.log(jnp.mean(p, axis=0))


def aleatoric_cls_loss(det: Dict, gt: Dict, rng, T: int = 42):
    C = det["cls"].shape[-1]
    one_hot = jax.nn.one_hot(gt["cls"].astype(jnp.int32), C)
    stddev = jnp.exp(jnp.clip(det["log_cls_stddev"], -40.0, 40.0))
    eps = jax.random.normal(rng, (T, *det["cls"].shape))
    s = jax.nn.softmax(det["cls"][None] + stddev[None] * eps, axis=-1)
    p = jnp.sum(s * one_hot[None], axis=-1)
    return -jnp.log(jnp.mean(p, axis=0))
