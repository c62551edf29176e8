"""Greedy NMS as a single Pallas kernel (whole loop in VMEM).

The XLA formulation (ops.nms.greedy_nms) runs max_out sequential
fori_loop iterations, each reading the candidate set from HBM.  Here the
K = pre-top-k candidates live in VMEM for the entire loop: per iteration
one masked argmax, one IoU vector, one mask update — no HBM traffic until
the final index write.  Exact same selection semantics as the XLA/TF
kernel (suppress IoU > thresh, first-index tie-break).

Candidates are laid out as (K/128, 128) planes per coordinate.  Image
batches are a grid axis (one grid cell per image) — Pallas kernels are not
``vmap``-able over SMEM outputs, so batching lives inside the kernel launch
instead (this replaces the reference's per-batch-element ``tf.while_loop``
NMS build, inference_aleatoric.py:104-145).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _kernel(y0, x0, y1, x1, sc, out_idx, out_cnt, alive, *, max_out, iou_thresh):
    # block shapes: (1, rows, LANES) VMEM candidates for this grid cell's
    # image; (NB, max_out)/(NB, 1) UNBLOCKED SMEM outputs (Mosaic requires
    # SMEM blocks to equal the array dims — each grid cell writes only its
    # own row, indexed by program_id); (rows, LANES) VMEM scratch
    img = pl.program_id(0)
    y0v, x0v, y1v, x1v, scv = y0[0], x0[0], y1[0], x1[0], sc[0]
    rows = scv.shape[0]
    area = jnp.maximum(y1v - y0v, 0.0) * jnp.maximum(x1v - x0v, 0.0)
    alive[...] = jnp.ones((rows, LANES), jnp.float32)
    neg_inf = float("-inf")  # python scalar: traced constants can't be captured

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    flat_ids = row_ids * LANES + col_ids

    def body(t, cnt):
        masked = jnp.where(alive[...] > 0.0, scv, neg_inf)
        m = jnp.max(masked)
        ok = m > neg_inf
        # first-flat-index argmax (ties toward the lower index, TF parity)
        is_max = masked >= m
        idx = jnp.min(jnp.where(is_max, flat_ids, jnp.int32(2**30)))
        # chosen-box coordinates via masked reductions (dynamic lane-indexed
        # scalar loads don't lower on Mosaic)
        sel = flat_ids == idx
        by0 = jnp.max(jnp.where(sel, y0v, neg_inf))
        bx0 = jnp.max(jnp.where(sel, x0v, neg_inf))
        by1 = jnp.max(jnp.where(sel, y1v, neg_inf))
        bx1 = jnp.max(jnp.where(sel, x1v, neg_inf))
        barea = jnp.maximum(by1 - by0, 0.0) * jnp.maximum(bx1 - bx0, 0.0)
        iy0 = jnp.maximum(y0v, by0)
        ix0 = jnp.maximum(x0v, bx0)
        iy1 = jnp.minimum(y1v, by1)
        ix1 = jnp.minimum(x1v, bx1)
        inter = jnp.maximum(iy1 - iy0, 0.0) * jnp.maximum(ix1 - ix0, 0.0)
        iou = inter / (area + barea - inter)
        sup = (iou > iou_thresh) | sel

        @pl.when(ok)
        def _():
            alive[...] = jnp.where(sup, 0.0, alive[...])

        out_idx[img, t] = jnp.where(ok, idx, -1)
        return cnt + ok.astype(jnp.int32)

    cnt = jax.lax.fori_loop(0, max_out, body, jnp.int32(0))
    out_cnt[img, 0] = cnt


@functools.partial(
    jax.jit, static_argnames=("max_out", "iou_thresh", "interpret")
)
def greedy_nms_pallas_batched(
    boxes, scores, max_out: int = 1000, iou_thresh: float = 0.5,
    interpret: bool = False,
):
    """(NB, K, 4) boxes + (NB, K) scores -> ((NB, max_out) int32, (NB,) count).

    One grid cell per image; each runs the full greedy loop over its own
    candidate planes in VMEM.  K must be a multiple of 128 (pad with -inf
    scores).  Per-image semantics match ops.nms.greedy_nms exactly.
    """
    nb, k = scores.shape
    assert k % LANES == 0, f"K={k} must be a multiple of {LANES}"
    rows = k // LANES
    planes = [
        boxes[..., i].astype(jnp.float32).reshape(nb, rows, LANES)
        for i in range(4)
    ]
    sc = scores.astype(jnp.float32).reshape(nb, rows, LANES)

    idx, cnt = pl.pallas_call(
        functools.partial(_kernel, max_out=max_out, iou_thresh=iou_thresh),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, rows, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
        ] * 5,
        out_specs=(
            pl.BlockSpec((nb, max_out), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),  # scalar index stores
            pl.BlockSpec((nb, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, max_out), jnp.int32),
            jax.ShapeDtypeStruct((nb, 1), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((rows, LANES), jnp.float32)],
        interpret=interpret,
    )(*planes, sc)
    return idx, cnt[:, 0]


@functools.partial(
    jax.jit, static_argnames=("max_out", "iou_thresh", "interpret")
)
def greedy_nms_pallas(
    boxes, scores, max_out: int = 1000, iou_thresh: float = 0.5,
    interpret: bool = False,
):
    """(K, 4) boxes + (K,) scores -> (indices (max_out,) int32, count).

    Single-image convenience wrapper over the batched kernel.
    """
    idx, cnt = greedy_nms_pallas_batched(
        boxes[None], scores[None], max_out=max_out, iou_thresh=iou_thresh,
        interpret=interpret,
    )
    return idx[0], cnt[0]
