"""Anchor decode, entropy / mutual-information math, epistemic reducers.

Numerical parity targets in lib_yolo/layers.py:

* ``split_detection`` / ``split_detection_aleatoric`` (:11-84) — per-prior
  channel layout ``[loc(4), (log_loc_var(4)), obj, (log_obj_stddev),
  cls(C), (log_cls_stddev(C))]``.
* box decode (:240-251, identical in all three decoders)::

      x = (col + sigmoid(tx)) / lw        y = (row + sigmoid(ty)) / lh
      w = exp(tw) * prior.w               h = exp(th) * prior.h
      -> corners [y0, x0, y1, x1], normalized [0,1] image fractions.

* ``logistic_entropy`` / ``softmax_entropy`` (:349-358).  Quirk fix: the
  reference computes ``p*log(p)`` directly, which yields NaN when a
  probability saturates to exactly 0/1 in float32; we use ``xlogy`` so the
  entropy is exactly 0 there (the correct limit) — documented deviation.
* ``decode_epistemic`` (:361-411) — mean / 4x4 epistemic covariance /
  aleatoric mean-variance / predictive vs posterior entropy / mutual info
  over the T-sample axis.
* ``decode_bbox_{standard,aleatoric,epistemic}`` (:191-346, 414-502) —
  column layouts documented in core.blueprint.VariantSpec.

All math runs in float32 regardless of the conv compute dtype.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from ..core.blueprint import VariantSpec


# --------------------------------------------------------------------------
# splitting raw head outputs
# --------------------------------------------------------------------------


def split_detection(raw, spec: VariantSpec, boxes_per_cell: int = 3) -> Dict:
    """Split a raw head tensor (..., h, w, B*chpp) into named fields.

    Returns dict of (..., h, w, B, .) tensors: ``loc``, ``obj``, ``cls`` and
    for aleatoric heads also ``log_loc_var``, ``log_obj_stddev``,
    ``log_cls_stddev`` (parity layers.py:11-84).
    """
    C = spec.cls_cnt
    chpp = spec.head_channels_per_prior
    *lead, h, w, ch = raw.shape
    assert ch == boxes_per_cell * chpp, (ch, boxes_per_cell, chpp)
    x = raw.reshape(*lead, h, w, boxes_per_cell, chpp).astype(jnp.float32)

    det = {"loc": x[..., 0:4]}
    if spec.aleatoric_head:
        det["log_loc_var"] = x[..., 4:8]
        det["obj"] = x[..., 8]
        det["log_obj_stddev"] = x[..., 9]
        det["cls"] = x[..., 10 : 10 + C]
        det["log_cls_stddev"] = x[..., 10 + C : 10 + 2 * C]
    else:
        det["obj"] = x[..., 4]
        det["cls"] = x[..., 5 : 5 + C]
    return det


# --------------------------------------------------------------------------
# entropies
# --------------------------------------------------------------------------


def _xlogx(p):
    return jax.scipy.special.xlogy(p, p)


def logistic_entropy(p):
    """Binary entropy of a probability (layers.py:349-353)."""
    return -(_xlogx(p) + _xlogx(1.0 - p))


def softmax_entropy(p):
    """Categorical entropy over the last axis (layers.py:356-358)."""
    return -jnp.sum(_xlogx(p), axis=-1)


# --------------------------------------------------------------------------
# box decode helpers
# --------------------------------------------------------------------------


def _grid_offsets(h: int, w: int):
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    return ys, xs


def _decode_corners(loc, priors_hw):
    """loc (..., h, w, B, 4) -> corners (..., h, w, B, 4) as [y0,x0,y1,x1]."""
    *lead, h, w, B, _ = loc.shape
    ys, xs = _grid_offsets(h, w)
    ys = ys[..., None]  # (h, w, 1)
    xs = xs[..., None]
    ph = priors_hw[:, 0]  # (B,)
    pw = priors_hw[:, 1]

    x = (xs + jax.nn.sigmoid(loc[..., 0])) / w
    y = (ys + jax.nn.sigmoid(loc[..., 1])) / h
    bw = jnp.exp(loc[..., 2]) * pw
    bh = jnp.exp(loc[..., 3]) * ph

    w2, h2 = bw / 2.0, bh / 2.0
    return jnp.stack([y - h2, x - w2, y + h2, x + w2], axis=-1)


# --------------------------------------------------------------------------
# per-variant decoders
# --------------------------------------------------------------------------


def decode_bbox_standard(det: Dict, priors_hw, layer_id: int = 0) -> jnp.ndarray:
    """(..., h, w, B, 7+C): [y0,x0,y1,x1, obj, cls..., layer_id, prior_id].

    Columns 0..4+C match the reference (layers.py:191-258, width 5+C).
    Documented deviation: the reference's standard JSON writer emits
    ``layer_id``/``prior_id`` keys read from the wrong columns (the last two
    class scores — inference_standard_yolov3.py:175-176).  We append real id
    columns so the keys can be written with correct values; every consumer
    indexes from the front (obj_idx=4, cls_start=5), so the extra trailing
    columns are invisible to the rest of the decode math.
    """
    corners = _decode_corners(det["loc"], priors_hw)
    obj = jax.nn.sigmoid(det["obj"])[..., None]
    cls = jax.nn.softmax(det["cls"], axis=-1)
    ones = jnp.ones_like(obj)
    return jnp.concatenate(
        [corners, obj, cls, layer_id * ones, _prior_id_like(ones)], axis=-1
    )


def decode_bbox_aleatoric(det: Dict, priors_hw, layer_id: int) -> jnp.ndarray:
    """(..., h, w, B, 14+C) per VariantSpec layout (layers.py:261-346)."""
    corners = _decode_corners(det["loc"], priors_hw)
    loc_var = jnp.exp(det["log_loc_var"])
    total_ale_var = jnp.prod(loc_var, axis=-1, keepdims=True)
    obj = jax.nn.sigmoid(det["obj"])
    cls = jax.nn.softmax(det["cls"], axis=-1)
    obj_entropy = logistic_entropy(obj)
    cls_entropy = softmax_entropy(cls)
    ones = jnp.ones_like(obj[..., None])
    return jnp.concatenate(
        [
            corners,
            loc_var,
            total_ale_var,
            obj[..., None],
            obj_entropy[..., None],
            cls,
            cls_entropy[..., None],
            layer_id * ones,
            _prior_id_like(ones),
        ],
        axis=-1,
    )


def _prior_id_like(ones):
    """(..., h, w, B, 1) tensor holding the prior index along B."""
    B = ones.shape[-2]
    pid = jax.lax.broadcasted_iota(jnp.float32, ones.shape, ones.ndim - 2)
    return pid


def decode_epistemic_stats(det: Dict) -> Dict:
    """Reduce T MC samples (leading axis) to epistemic statistics.

    Parity: layers.decode_epistemic (:361-411).  Input fields have shape
    (T, h, w, B, ...); outputs drop the T axis.
    """
    loc = det["loc"]
    loc_var = jnp.exp(det["log_loc_var"])
    obj = jax.nn.sigmoid(det["obj"])
    cls = jax.nn.softmax(det["cls"], axis=-1)

    ev_loc = jnp.mean(loc, axis=0)
    # E[x x^T] - E[x] E[x]^T, per anchor (4x4)
    ev_xxT = jnp.mean(loc[..., :, None] * loc[..., None, :], axis=0)
    epi_covar_loc = ev_xxT - ev_loc[..., :, None] * ev_loc[..., None, :]
    ale_var_loc = jnp.mean(loc_var, axis=0)

    obj_mean = jnp.mean(obj, axis=0)
    obj_pred_ent = logistic_entropy(obj_mean)
    obj_post_ent = jnp.mean(logistic_entropy(obj), axis=0)

    cls_mean = jnp.mean(cls, axis=0)
    cls_pred_ent = softmax_entropy(cls_mean)
    cls_post_ent = jnp.mean(softmax_entropy(cls), axis=0)

    return {
        "ev_loc": ev_loc,
        "epi_covar_loc": epi_covar_loc,
        "ale_var_loc": ale_var_loc,
        "obj_mean": obj_mean,
        "obj_mutual_info": obj_pred_ent - obj_post_ent,
        "obj_entropy": obj_pred_ent,
        "cls_mean": cls_mean,
        "cls_mutual_info": cls_pred_ent - cls_post_ent,
        "cls_entropy": cls_pred_ent,
    }


def decode_bbox_epistemic(stats: Dict, priors_hw, layer_id: int) -> jnp.ndarray:
    """(h, w, B, 21+C) per VariantSpec layout (layers.py:414-502)."""
    corners = _decode_corners(stats["ev_loc"], priors_hw)
    epi_loc_var = jnp.diagonal(stats["epi_covar_loc"], axis1=-2, axis2=-1)
    total_var_epi = jnp.linalg.det(stats["epi_covar_loc"])[..., None]
    ale_var_loc = stats["ale_var_loc"]
    total_var_ale = jnp.sum(ale_var_loc, axis=-1, keepdims=True)
    ones = jnp.ones_like(stats["obj_mean"][..., None])
    return jnp.concatenate(
        [
            corners,
            epi_loc_var,
            ale_var_loc,
            total_var_epi,
            total_var_ale,
            stats["obj_mean"][..., None],
            stats["obj_mutual_info"][..., None],
            stats["obj_entropy"][..., None],
            stats["cls_mean"],
            stats["cls_mutual_info"][..., None],
            stats["cls_entropy"][..., None],
            layer_id * ones,
            _prior_id_like(ones),
        ],
        axis=-1,
    )


# --------------------------------------------------------------------------
# flattening across scales
# --------------------------------------------------------------------------


def concat_all_scales(decoded: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Flatten per-scale decoded tensors to one (N_total, width) tensor.

    Row order parity with the reference's ``concat_bbox``
    (inference_epistemic.py:173-184): layer-major, then prior-major, then
    row-major cells — each per-prior (h, w, width) grid is flattened before
    the next prior is appended.
    """
    flat = []
    for d in decoded:
        h, w, B, width = d.shape
        flat.append(jnp.transpose(d, (2, 0, 1, 3)).reshape(B * h * w, width))
    return jnp.concatenate(flat, axis=0)


def concat_all_scales_batched(decoded: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Batched ``concat_all_scales``: [(NB, h, w, B, width), ...] ->
    (NB, N_total, width), same per-image row order."""
    flat = []
    for d in decoded:
        nb, h, w, B, width = d.shape
        flat.append(jnp.transpose(d, (0, 3, 1, 2, 4)).reshape(nb, B * h * w, width))
    return jnp.concatenate(flat, axis=1)
