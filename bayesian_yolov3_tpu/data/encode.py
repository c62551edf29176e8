"""Vectorized ground-truth encoding for the YOLO loss.

Semantics parity with the production TF-graph encoder
(lib_yolo/tfdata.py:77-171) and its numpy reference (data.py:162-214):

* per GT box, the responsible anchors are those that (a) lie in the grid
  cell containing the box center — ``0 <= lw*(x - cx) <= 1`` per axis,
  tfdata.py:114-118 — AND (b) achieve the globally best IoU across ALL
  anchors of ALL three scales (``iou >= max(iou)``, ties included,
  tfdata.py:122-125);
* targets at responsible anchors::

      tx = logit(clip(lw*(x - cx), 1e-7, 1 - 1e-7))   (ty likewise)
      tw = log(max(w / prior.w, 1e-7))                (th likewise)

* anchors whose prior-grid IoU with ANY GT box >= ``ign_thresh`` get
  ``ign = 0`` (their objectness loss is masked), then ``ign = max(ign,
  obj)`` so responsible anchors always contribute (tfdata.py:140-154);
* ORDER-DEPENDENT OVERWRITE: the reference loops boxes sequentially and
  later boxes overwrite earlier ones at shared anchors.  The vectorized
  form preserves this exactly by resolving each anchor to the
  highest-index claiming box.

Instead of a ``tf.while_loop`` over boxes, everything is one batched
claims-matrix computation over (max_boxes, total_anchors) — fully static
shapes, jit/vmap-friendly, runs on host CPU or device.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.blueprint import ModelBlueprint

EPS = 1e-7  # reference tfdata.py:134


@dataclasses.dataclass(frozen=True)
class PriorTables:
    """Flattened per-anchor constants over all three scales.

    Flattening order parity with tfdata.create_prior_data (:14-74): per
    scale row-major over (h, w, B), scales concatenated 32 -> 16 -> 8.
    """

    bboxes: np.ndarray  # (N, 4) [ymin, xmin, ymax, xmax] prior grid boxes
    areas: np.ndarray  # (N,) prior areas (h*w of the prior, data.py:133)
    cx: np.ndarray  # (N,) cell left edge / lw
    cy: np.ndarray  # (N,) cell top edge / lh
    pw: np.ndarray  # (N,)
    ph: np.ndarray  # (N,)
    lw: np.ndarray  # (N,) grid width of the anchor's scale
    lh: np.ndarray  # (N,)
    layer_sizes: Tuple[int, ...]  # anchors per scale
    layer_shapes: Tuple[Tuple[int, int, int], ...]  # (h, w, B) per scale


def build_prior_tables(blueprint: ModelBlueprint) -> PriorTables:
    """Numpy construction of the prior tables (parity data.py:119-159)."""
    cols = {k: [] for k in ("bboxes", "areas", "cx", "cy", "pw", "ph", "lw", "lh")}
    sizes, shapes = [], []
    for scale in blueprint.det_scales:
        h, w, B = scale.h, scale.w, scale.boxes_per_cell
        rows = np.arange(h, dtype=np.float32)
        colsx = np.arange(w, dtype=np.float32)
        yc = ((rows + 0.5) / h)[:, None, None]  # (h,1,1)
        xc = ((colsx + 0.5) / w)[None, :, None]  # (1,w,1)
        ph = np.asarray([p.h for p in scale.priors], np.float32)[None, None, :]
        pw = np.asarray([p.w for p in scale.priors], np.float32)[None, None, :]
        shape = (h, w, B)
        bb = np.stack(
            [
                np.broadcast_to(yc - ph / 2, shape),
                np.broadcast_to(xc - pw / 2, shape),
                np.broadcast_to(yc + ph / 2, shape),
                np.broadcast_to(xc + pw / 2, shape),
            ],
            axis=-1,
        )
        cols["bboxes"].append(bb.reshape(-1, 4))
        cols["areas"].append(np.broadcast_to(ph * pw, shape).reshape(-1))
        cols["cx"].append(np.broadcast_to((colsx / w)[None, :, None], shape).reshape(-1))
        cols["cy"].append(np.broadcast_to((rows / h)[:, None, None], shape).reshape(-1))
        cols["pw"].append(np.broadcast_to(pw, shape).reshape(-1))
        cols["ph"].append(np.broadcast_to(ph, shape).reshape(-1))
        cols["lw"].append(np.full(h * w * B, w, np.float32))
        cols["lh"].append(np.full(h * w * B, h, np.float32))
        sizes.append(h * w * B)
        shapes.append(shape)
    return PriorTables(
        **{k: np.concatenate(v).astype(np.float32) for k, v in cols.items()},
        layer_sizes=tuple(sizes),
        layer_shapes=tuple(shapes),
    )


def _logit(x):
    # parity tfdata.py:7-11: -log(1/x - 1)
    return -jnp.log(1.0 / x - 1.0)


def encode_boxes(
    bboxes,
    labels,
    valid,
    tables: PriorTables,
    ign_thresh: float = 0.7,
) -> List[Dict[str, jnp.ndarray]]:
    """Encode padded GT boxes into per-scale training targets.

    Args:
      bboxes: (M, 4) float32, [ymin, xmin, ymax, xmax] normalized (the
        tf.image / tfrecord order, dataset_utils.py:38).
      labels: (M,) int32 class ids (already background-shifted).
      valid: (M,) bool mask over the static padding.
      tables: precomputed ``PriorTables`` for the model blueprint.
      ign_thresh: IoU ignore threshold (reference config, 0.7).

    Returns: one dict per scale with 'loc' (h,w,B,4), 'obj'/'ign' (h,w,B)
    float32 and 'cls' (h,w,B) int32 — matching tfdata.encode_boxes:161-171.
    """
    bboxes = jnp.asarray(bboxes, jnp.float32)
    labels = jnp.asarray(labels, jnp.int32)
    valid = jnp.asarray(valid, jnp.bool_)

    bb = jnp.stack([tables.bboxes[:, i] for i in range(4)], axis=0)  # (4, N)
    areas = jnp.asarray(tables.areas)
    cx, cy = jnp.asarray(tables.cx), jnp.asarray(tables.cy)
    pw, ph = jnp.asarray(tables.pw), jnp.asarray(tables.ph)
    lw, lh = jnp.asarray(tables.lw), jnp.asarray(tables.lh)

    w = bboxes[:, 3] - bboxes[:, 1]  # (M,)
    h = bboxes[:, 2] - bboxes[:, 0]
    x = (bboxes[:, 3] + bboxes[:, 1]) / 2.0
    y = (bboxes[:, 2] + bboxes[:, 0]) / 2.0

    # (M, N) distances of box centers to each anchor's cell origin
    dist_x = lw[None, :] * (x[:, None] - cx[None, :])
    dist_y = lh[None, :] * (y[:, None] - cy[None, :])
    cell_mask = (
        (dist_x >= 0.0) & (dist_x <= 1.0) & (dist_y >= 0.0) & (dist_y <= 1.0)
    )

    # (M, N) IoU of each GT box against the full prior grid
    # (parity tfdata.calc_iou:174-188: union uses the PRIOR area table)
    iy0 = jnp.maximum(bb[0][None, :], bboxes[:, 0:1])
    ix0 = jnp.maximum(bb[1][None, :], bboxes[:, 1:2])
    iy1 = jnp.minimum(bb[2][None, :], bboxes[:, 2:3])
    ix1 = jnp.minimum(bb[3][None, :], bboxes[:, 3:4])
    inter = jnp.maximum(iy1 - iy0, 0.0) * jnp.maximum(ix1 - ix0, 0.0)
    union = areas[None, :] - inter + (h * w)[:, None]
    iou = inter / union

    best = iou >= jnp.max(iou, axis=1, keepdims=True)  # global argmax, ties kept
    claims = best & cell_mask & valid[:, None]  # (M, N)
    ign_hit = (iou >= ign_thresh) & valid[:, None]

    # later boxes overwrite earlier ones: winner = highest claiming index.
    # TPU note: winner-indexed gathers (take_along_axis / w[winner]) lower
    # to per-element loops on TPU (see CLAUDE.md); instead the winner is a
    # one-hot (M, N) selector — rank is unique among claimants, so
    # rank == max picks exactly the highest claiming box — and every
    # "gather" becomes a dense masked reduction XLA fuses into one pass.
    m = bboxes.shape[0]
    rank = (jnp.arange(m, dtype=jnp.int32) + 1)[:, None] * claims.astype(jnp.int32)
    rank_max = jnp.max(rank, axis=0, keepdims=True)  # (1, N)
    sel = (rank == rank_max) & (rank_max > 0)  # one-hot over M (all-zero if no claim)
    obj = jnp.any(claims, axis=0)

    self_f = sel.astype(jnp.float32)
    dx = jnp.sum(dist_x * self_f, axis=0)
    dy = jnp.sum(dist_y * self_f, axis=0)
    w_sel = jnp.sum(w[:, None] * self_f, axis=0)
    h_sel = jnp.sum(h[:, None] * self_f, axis=0)
    tx = _logit(jnp.clip(dx, EPS, 1.0 - EPS))
    ty = _logit(jnp.clip(dy, EPS, 1.0 - EPS))
    tw = jnp.log(jnp.maximum(w_sel / pw, EPS))
    th = jnp.log(jnp.maximum(h_sel / ph, EPS))

    objf = obj.astype(jnp.float32)
    loc = jnp.stack([tx, ty, tw, th], axis=1) * objf[:, None]
    cls = jnp.sum(labels[:, None] * sel.astype(jnp.int32), axis=0)
    ign = 1.0 - jnp.any(ign_hit, axis=0).astype(jnp.float32)
    ign = jnp.maximum(ign, objf)  # tfdata.py:154

    out = []
    off = 0
    for (gh, gw, gB), size in zip(tables.layer_shapes, tables.layer_sizes):
        sl = slice(off, off + size)
        out.append(
            {
                "loc": loc[sl].reshape(gh, gw, gB, 4),
                "cls": cls[sl].reshape(gh, gw, gB),
                "obj": objf[sl].reshape(gh, gw, gB),
                "ign": ign[sl].reshape(gh, gw, gB),
            }
        )
        off += size
    return out


def pad_boxes(bboxes: np.ndarray, labels: np.ndarray, max_boxes: int):
    """Pad variable-length GT to static (max_boxes, ...) + validity mask."""
    m = min(len(bboxes), max_boxes)
    out_b = np.zeros((max_boxes, 4), np.float32)
    out_l = np.zeros((max_boxes,), np.int32)
    out_v = np.zeros((max_boxes,), bool)
    if m:
        out_b[:m] = bboxes[:m]
        out_l[:m] = labels[:m]
        out_v[:m] = True
    return out_b, out_l, out_v
