"""On-device class-agnostic greedy NMS with fixed shapes.

The reference delegates NMS to TF's sequential CPU kernel
(``tf.image.non_max_suppression``, inference_epistemic.py:99-128,
max 1000 boxes, default IoU threshold 0.5, scored by objectness,
class-agnostic, no score threshold).  A data-dependent output size cannot
live under ``jit``, so here the greedy loop is a fixed-trip
``lax.fori_loop`` producing a padded index vector plus a count — the exact
same selection order and suppression semantics (suppress when IoU is
strictly greater than the threshold; ties broken toward the lower index,
matching TF's stable sort + first-argmax).

The per-class NMS variant used for the paper (kept as commented-out code in
the reference, inference_epistemic.py:104-126) is provided as
``per_class_nms``.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _iou_one_vs_all(box, boxes, areas):
    """IoU of one [y0,x0,y1,x1] box against (N,4) boxes."""
    y0 = jnp.maximum(boxes[:, 0], box[0])
    x0 = jnp.maximum(boxes[:, 1], box[1])
    y1 = jnp.minimum(boxes[:, 2], box[2])
    x1 = jnp.minimum(boxes[:, 3], box[3])
    inter = jnp.maximum(y1 - y0, 0.0) * jnp.maximum(x1 - x0, 0.0)
    area = jnp.maximum(box[2] - box[0], 0.0) * jnp.maximum(box[3] - box[1], 0.0)
    return inter / (areas + area - inter)


@partial(jax.jit, static_argnames=("max_out",))
def greedy_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_out: int = 1000,
    iou_thresh: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy class-agnostic NMS.

    Args:
      boxes: (N, 4) [y0, x0, y1, x1] (any consistent coordinate scale).
      scores: (N,) selection scores.
      max_out: maximum selections (reference: 1000).
      iou_thresh: suppress candidates with IoU > thresh (TF default 0.5).

    Returns:
      (indices, count): indices (max_out,) int32, -1 padded past ``count``.
    """
    boxes = boxes.astype(jnp.float32)
    scores = scores.astype(jnp.float32)
    n = boxes.shape[0]
    areas = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0.0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0.0
    )

    def body(t, carry):
        alive, out, cnt = carry
        masked = jnp.where(alive, scores, -jnp.inf)
        idx = jnp.argmax(masked)
        ok = masked[idx] > -jnp.inf
        iou = _iou_one_vs_all(boxes[idx], boxes, areas)
        # NaN IoU (degenerate zero-area boxes) compares False -> kept alive,
        # matching the TF kernel's behavior.
        alive_next = alive & ~(iou > iou_thresh)
        alive_next = alive_next.at[idx].set(False)
        alive = jnp.where(ok, alive_next, alive)
        out = out.at[t].set(jnp.where(ok, idx, -1))
        return alive, out, cnt + ok.astype(jnp.int32)

    alive0 = jnp.ones((n,), jnp.bool_)
    out0 = jnp.full((max_out,), -1, jnp.int32)
    _, indices, count = jax.lax.fori_loop(0, max_out, body, (alive0, out0, 0))
    return indices, count


@partial(
    jax.jit,
    static_argnames=(
        "max_out", "obj_idx", "iou_thresh", "pre_top_k", "use_pallas",
        "interpret", "with_certificate",
    ),
)
def nms_select(
    decoded: jnp.ndarray,
    obj_idx: int,
    max_out: int = 1000,
    iou_thresh: float = 0.5,
    pre_top_k: int = 0,
    use_pallas: bool = False,
    interpret: bool = False,
    with_certificate: bool = False,
):
    """NMS over a flattened decoded tensor, scored by its objectness column.

    Mirrors the reference's ``nms`` helper (inference_epistemic.py:99-128):
    boxes are columns [0:4], score is ``decoded[:, obj_idx]``.

    ``pre_top_k > 0`` restricts the greedy loop to the top-k anchors by
    score.  ``with_certificate=True`` additionally returns a per-call
    boolean PROOF that the restricted selection equals exact full-anchor
    NMS:

        cert = (count == max_out) and (min selected score >= max excluded
               score)

    Soundness: by induction, at every greedy step the full-set argmax over
    alive candidates coincides with the restricted-set argmax — any
    excluded candidate scores <= the max excluded score <= every selected
    score, so it can only become the argmax after max_out selections have
    already been emitted.  Ties are safe because ``jax.lax.top_k`` keeps
    the LOWEST indices among equal scores, and greedy argmax breaks ties
    toward the lower index — a tied excluded candidate always has a higher
    index than its tied included peers.  (The production runner retries
    uncertified batches through an exact pre_top_k=0 program.)

    Returns (selected (max_out, width) zero-padded, valid (max_out,) bool,
    count[, cert]).
    """
    excluded_max = None
    if pre_top_k and pre_top_k < decoded.shape[0]:
        top_scores, top_idx = jax.lax.top_k(decoded[:, obj_idx], pre_top_k + 1)
        excluded_max = top_scores[pre_top_k]
        decoded = decoded[top_idx[:pre_top_k]]
    if use_pallas:
        # whole greedy loop in VMEM (ops.pallas_nms); -inf-score padding to
        # a lane multiple never gets selected.  The image-vectorized kernel
        # (no per-iteration scalar stores) is preferred whenever its planes
        # fit the VMEM budget.
        from .pallas_nms import (
            LANES, fits_imgvec, greedy_nms_pallas, greedy_nms_pallas_imgvec,
        )

        n = decoded.shape[0]
        pad = (-n) % LANES
        boxes = jnp.pad(decoded[:, :4], ((0, pad), (0, 0)))
        scores = jnp.pad(decoded[:, obj_idx], (0, pad), constant_values=-jnp.inf)
        if fits_imgvec(1, n + pad):
            indices, count = greedy_nms_pallas_imgvec(
                boxes[None], scores[None], max_out=max_out,
                iou_thresh=float(iou_thresh), interpret=interpret,
            )
            indices, count = indices[0], count[0]
        else:
            indices, count = greedy_nms_pallas(
                boxes, scores, max_out=max_out, iou_thresh=float(iou_thresh),
                interpret=interpret,
            )
    else:
        indices, count = greedy_nms(
            decoded[:, :4], decoded[:, obj_idx], max_out, iou_thresh
        )
    valid = indices >= 0
    rows = decoded[jnp.maximum(indices, 0)]
    rows = jnp.where(valid[:, None], rows, jnp.zeros_like(rows))
    if not with_certificate:
        return rows, valid, count
    if excluded_max is None:
        cert = jnp.bool_(True)  # no pre-filter: exact by construction
    else:
        min_sel = jnp.min(jnp.where(valid, rows[:, obj_idx], jnp.inf))
        cert = (count == max_out) & (min_sel >= excluded_max)
    return rows, valid, count, cert


@partial(
    jax.jit,
    static_argnames=(
        "max_out", "obj_idx", "iou_thresh", "pre_top_k", "use_pallas",
        "interpret", "with_certificate",
    ),
)
def nms_select_batch(
    decoded: jnp.ndarray,
    obj_idx: int,
    max_out: int = 1000,
    iou_thresh: float = 0.5,
    pre_top_k: int = 0,
    use_pallas: bool = False,
    interpret: bool = False,
    with_certificate: bool = False,
):
    """Image-batched ``nms_select``: (NB, N, width) -> per-image selections.

    The Pallas greedy kernel is not ``vmap``-able (SMEM outputs), so image
    batching is a kernel grid axis (ops.pallas_nms.greedy_nms_pallas_batched)
    instead of a vmap — this is the production path for the reference's
    batched standard/aleatoric inference (inference_aleatoric.py:104-145).

    ``with_certificate=True``: also return a per-image exactness proof for
    the pre-top-k restriction (see nms_select).

    Returns (rows (NB, max_out, width), valid (NB, max_out), count (NB,)
    [, cert (NB,) bool]).
    """
    excluded_max = None
    if pre_top_k and pre_top_k < decoded.shape[1]:
        top_scores, top_idx = jax.lax.top_k(decoded[:, :, obj_idx], pre_top_k + 1)
        excluded_max = top_scores[:, pre_top_k]
        decoded = jnp.take_along_axis(
            decoded, top_idx[:, :pre_top_k, None], axis=1
        )
    if use_pallas:
        from .pallas_nms import (
            LANES, fits_imgvec, greedy_nms_pallas_batched,
            greedy_nms_pallas_imgvec,
        )

        n = decoded.shape[1]
        pad = (-n) % LANES
        boxes = jnp.pad(decoded[:, :, :4], ((0, 0), (0, pad), (0, 0)))
        scores = jnp.pad(
            decoded[:, :, obj_idx], ((0, 0), (0, pad)), constant_values=-jnp.inf
        )
        kernel = (
            greedy_nms_pallas_imgvec
            if fits_imgvec(decoded.shape[0], n + pad)
            else greedy_nms_pallas_batched
        )
        indices, count = kernel(
            boxes, scores, max_out=max_out, iou_thresh=float(iou_thresh),
            interpret=interpret,
        )
    else:
        indices, count = jax.vmap(
            lambda b, s: greedy_nms(b, s, max_out, iou_thresh)
        )(decoded[:, :, :4], decoded[:, :, obj_idx])
    valid = indices >= 0
    rows = jnp.take_along_axis(decoded, jnp.maximum(indices, 0)[:, :, None], axis=1)
    rows = jnp.where(valid[:, :, None], rows, jnp.zeros_like(rows))
    if not with_certificate:
        return rows, valid, count
    if excluded_max is None:
        cert = jnp.ones((decoded.shape[0],), jnp.bool_)
    else:
        min_sel = jnp.min(
            jnp.where(valid, rows[:, :, obj_idx], jnp.inf), axis=1
        )
        cert = (count == max_out) & (min_sel >= excluded_max)
    return rows, valid, count, cert


def per_class_nms(
    decoded: jnp.ndarray,
    obj_idx: int,
    cls_start_idx: int,
    cls_cnt: int,
    max_out: int = 1000,
    iou_thresh: float = 0.5,
):
    """Per-class NMS (the paper's variant, reference :104-126, 2 classes).

    Boxes are partitioned by argmax class score; NMS runs per class with
    non-member scores masked to -inf; results are concatenated.

    Returns (selected (cls_cnt*max_out, width), valid, count).
    """
    cls_scores = decoded[:, cls_start_idx : cls_start_idx + cls_cnt]
    winner = jnp.argmax(cls_scores, axis=-1)
    all_rows, all_valid, total = [], [], jnp.zeros((), jnp.int32)
    for c in range(cls_cnt):
        member = winner == c
        scores = jnp.where(member, decoded[:, obj_idx], -jnp.inf)
        indices, count = greedy_nms(decoded[:, :4], scores, max_out, iou_thresh)
        valid = indices >= 0
        rows = decoded[jnp.maximum(indices, 0)]
        all_rows.append(jnp.where(valid[:, None], rows, jnp.zeros_like(rows)))
        all_valid.append(valid)
        total = total + count
    return jnp.concatenate(all_rows), jnp.concatenate(all_valid), total
