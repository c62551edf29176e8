"""Fused Pallas kernel: epistemic statistics + bbox decode in one HBM pass.

The XLA path (ops.decode.decode_epistemic_stats + decode_bbox_epistemic)
operates on tensors whose minor dimensions are tiny (chpp=16 fields, 4x4
covariances), so every elementwise pass wastes ~90% of the (8,128) VPU
tile and the whole decode costs ~140 ms/image at ECP resolution — more
than the T=30 forward itself.  This kernel restructures the layout so the
ANCHOR axis is the 128-lane axis:

    raw (T, h, w, B*chpp)  --XLA transpose-->  (B, chpp, T, hw)

and then computes, per (prior, anchor-tile) grid cell, in a single VMEM
residency: all T-sample reductions (loc mean, loc outer-product moments,
aleatoric variance mean, sigmoid/softmax + posterior entropies), the
predictive entropies / mutual information, the 4x4 epistemic covariance
(diagonal + determinant via static cofactor expansion), and the anchor-box
corner decode — emitting the final (21+C)-wide epistemic rows of
ops.decode.decode_bbox_epistemic (layers.py:361-502 semantics).

Numerical parity with the XLA path is tested in tests/test_pallas.py;
everything accumulates in float32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _xlogx(p):
    return jnp.where(p > 0, p * jnp.log(jnp.where(p > 0, p, 1.0)), 0.0)


def _logistic_entropy(p):
    return -(_xlogx(p) + _xlogx(1.0 - p))


def _det4(m):
    """Determinant of a symmetric 4x4 given as m[i][j] vectors (lanes)."""

    def det3(a):
        return (
            a[0][0] * (a[1][1] * a[2][2] - a[1][2] * a[2][1])
            - a[0][1] * (a[1][0] * a[2][2] - a[1][2] * a[2][0])
            + a[0][2] * (a[1][0] * a[2][1] - a[1][1] * a[2][0])
        )

    total = None
    for j in range(4):
        minor = [[m[r][c] for c in range(4) if c != j] for r in range(1, 4)]
        term = m[0][j] * det3(minor)
        signed = -term if j % 2 else term
        total = signed if total is None else total + signed
    return total


def _kernel(x_ref, xoff_ref, yoff_ref, pri_ref, out_ref, *, T, C, lw, lh, layer_id):
    """Grid cell = (prior b, anchor tile).

    x_ref:   (1, chpp, T, tile) f32 — raw head fields for prior b
    xoff/yoff: (1, tile) f32 — grid cell column/row index per anchor
    pri_ref: (B, 2) f32 in SMEM — (prior_h, prior_w) rows, indexed by b
    out_ref: (1, width, tile) f32 — decoded epistemic rows (transposed)
    """
    x = x_ref[0]  # (chpp, T, tile)
    inv_T = 1.0 / T

    loc = [x[j] for j in range(4)]  # each (T, tile): tx, ty, tw, th
    ev = [jnp.sum(l, axis=0) * inv_T for l in loc]  # (tile,)

    # second moments for the 4x4 covariance (upper triangle)
    cov = [[None] * 4 for _ in range(4)]
    for i in range(4):
        for j in range(i, 4):
            m2 = jnp.sum(loc[i] * loc[j], axis=0) * inv_T
            cov_ij = m2 - ev[i] * ev[j]
            cov[i][j] = cov_ij
            cov[j][i] = cov_ij

    ale = [jnp.sum(jnp.exp(x[4 + j]), axis=0) * inv_T for j in range(4)]

    obj = jax.nn.sigmoid(x[8])  # (T, tile)
    obj_mean = jnp.sum(obj, axis=0) * inv_T
    obj_post_ent = jnp.sum(_logistic_entropy(obj), axis=0) * inv_T
    obj_pred_ent = _logistic_entropy(obj_mean)

    cls_logits = [x[10 + c] for c in range(C)]  # (T, tile) each
    cmax = cls_logits[0]
    for c in range(1, C):
        cmax = jnp.maximum(cmax, cls_logits[c])
    exps = [jnp.exp(l - cmax) for l in cls_logits]
    denom = exps[0]
    for e in exps[1:]:
        denom = denom + e
    probs = [e / denom for e in exps]
    cls_mean = [jnp.sum(p, axis=0) * inv_T for p in probs]
    post_ent = jnp.zeros_like(probs[0])
    for p in probs:
        post_ent = post_ent - _xlogx(p)
    cls_post_ent = jnp.sum(post_ent, axis=0) * inv_T
    cls_pred_ent = jnp.zeros_like(cls_mean[0])
    for p in cls_mean:
        cls_pred_ent = cls_pred_ent - _xlogx(p)

    # corner decode on the mean localization (layers.py:240-251)
    b_sel = pl.program_id(0)
    ph = pri_ref[b_sel, 0]
    pw = pri_ref[b_sel, 1]
    bx = (xoff_ref[0] + jax.nn.sigmoid(ev[0])) * (1.0 / lw)
    by = (yoff_ref[0] + jax.nn.sigmoid(ev[1])) * (1.0 / lh)
    bw = jnp.exp(ev[2]) * pw
    bh = jnp.exp(ev[3]) * ph
    w2, h2 = bw * 0.5, bh * 0.5

    b_idx = pl.program_id(0)
    rows = [
        by - h2, bx - w2, by + h2, bx + w2,             # y0 x0 y1 x1
        cov[0][0], cov[1][1], cov[2][2], cov[3][3],     # epi var diag
        ale[0], ale[1], ale[2], ale[3],                 # ale var
        _det4(cov),                                     # total_var_epi
        ale[0] + ale[1] + ale[2] + ale[3],              # total_var_ale
        obj_mean, obj_pred_ent - obj_post_ent, obj_pred_ent,
        *cls_mean, cls_pred_ent - cls_post_ent, cls_pred_ent,
        jnp.full_like(obj_mean, float(layer_id)),
        jnp.full_like(obj_mean, 1.0) * b_idx.astype(jnp.float32),
    ]
    out_ref[0] = jnp.stack(rows, axis=0)


# --------------------------------------------------------------------------
# Split formulation for multi-chip MC-sample parallelism: per-device partial
# moment sums over the local T/N samples (``_moments_kernel``), an ICI
# all-reduce of those sums (lax.psum over the ``mc`` axis, outside), then a
# finalize kernel turning global sums into the decoded epistemic rows.
# moments == what `_kernel` reduces internally, just unscaled by 1/T, so the
# composition is numerically identical up to the sum-order of the psum.
#
# Moment row layout (M = 21 + C rows per prior, anchors on lanes):
#   [0:4)    sum loc (tx, ty, tw, th)
#   [4:14)   sum loc_i * loc_j, upper triangle in (i<=j) row-major order
#   [14:18)  sum exp(log_loc_var)                (aleatoric)
#   [18]     sum sigmoid(obj)
#   [19]     sum logistic_entropy(sigmoid(obj))  (posterior entropy)
#   [20:20+C) sum softmax(cls)
#   [20+C]   sum softmax posterior entropy
# --------------------------------------------------------------------------

_TRIU = [(i, j) for i in range(4) for j in range(i, 4)]


def _moments_kernel(x_ref, out_ref, *, C):
    x = x_ref[0]  # (chpp, T_local, tile)
    sums = [jnp.sum(x[j], axis=0) for j in range(4)]
    sums += [jnp.sum(x[i] * x[j], axis=0) for i, j in _TRIU]
    sums += [jnp.sum(jnp.exp(x[4 + j]), axis=0) for j in range(4)]
    obj = jax.nn.sigmoid(x[8])
    sums.append(jnp.sum(obj, axis=0))
    sums.append(jnp.sum(_logistic_entropy(obj), axis=0))
    cls_logits = [x[10 + c] for c in range(C)]
    cmax = cls_logits[0]
    for c in range(1, C):
        cmax = jnp.maximum(cmax, cls_logits[c])
    exps = [jnp.exp(l - cmax) for l in cls_logits]
    denom = exps[0]
    for e in exps[1:]:
        denom = denom + e
    probs = [e / denom for e in exps]
    sums += [jnp.sum(p, axis=0) for p in probs]
    post_ent = jnp.zeros_like(probs[0])
    for p in probs:
        post_ent = post_ent - _xlogx(p)
    sums.append(jnp.sum(post_ent, axis=0))
    out_ref[0] = jnp.stack(sums, axis=0)  # (M, tile)


def _finalize_kernel(
    m_ref, xoff_ref, yoff_ref, pri_ref, out_ref, *, T, C, lw, lh, layer_id
):
    m = m_ref[0]  # (M, tile) global moment sums
    inv_T = 1.0 / T
    ev = [m[j] * inv_T for j in range(4)]
    cov = [[None] * 4 for _ in range(4)]
    for k, (i, j) in enumerate(_TRIU):
        cov_ij = m[4 + k] * inv_T - ev[i] * ev[j]
        cov[i][j] = cov_ij
        cov[j][i] = cov_ij
    ale = [m[14 + j] * inv_T for j in range(4)]
    obj_mean = m[18] * inv_T
    obj_post_ent = m[19] * inv_T
    obj_pred_ent = _logistic_entropy(obj_mean)
    cls_mean = [m[20 + c] * inv_T for c in range(C)]
    cls_post_ent = m[20 + C] * inv_T
    cls_pred_ent = jnp.zeros_like(cls_mean[0])
    for p in cls_mean:
        cls_pred_ent = cls_pred_ent - _xlogx(p)

    b_idx = pl.program_id(0)
    ph = pri_ref[b_idx, 0]
    pw = pri_ref[b_idx, 1]
    bx = (xoff_ref[0] + jax.nn.sigmoid(ev[0])) * (1.0 / lw)
    by = (yoff_ref[0] + jax.nn.sigmoid(ev[1])) * (1.0 / lh)
    bw = jnp.exp(ev[2]) * pw
    bh = jnp.exp(ev[3]) * ph
    w2, h2 = bw * 0.5, bh * 0.5

    rows = [
        by - h2, bx - w2, by + h2, bx + w2,             # y0 x0 y1 x1
        cov[0][0], cov[1][1], cov[2][2], cov[3][3],     # epi var diag
        ale[0], ale[1], ale[2], ale[3],                 # ale var
        _det4(cov),                                     # total_var_epi
        ale[0] + ale[1] + ale[2] + ale[3],              # total_var_ale
        obj_mean, obj_pred_ent - obj_post_ent, obj_pred_ent,
        *cls_mean, cls_pred_ent - cls_post_ent, cls_pred_ent,
        jnp.full_like(obj_mean, float(layer_id)),
        jnp.full_like(obj_mean, 1.0) * b_idx.astype(jnp.float32),
    ]
    out_ref[0] = jnp.stack(rows, axis=0)


@functools.partial(jax.jit, static_argnames=("cls_cnt", "n_priors", "interpret"))
def epistemic_moments_cf(raw_cf, *, cls_cnt: int, n_priors: int = 3,
                         interpret: bool = False):
    """Partial epistemic moment sums over the LOCAL sample axis.

    raw_cf (B*chpp, T_local, total) f32 (detection_conv_cf layout) ->
    (B, 21+C, total) f32 sums.  Sum these across the ``mc`` mesh axis
    (lax.psum) to get global moments for ``epistemic_finalize``.
    """
    ch, T_local, total = raw_cf.shape
    B = n_priors
    chpp = ch // B
    C = cls_cnt
    assert chpp == 2 * (5 + C), (chpp, C)
    M = 21 + C
    x = raw_cf.reshape(B, chpp, T_local, total).astype(jnp.float32)
    tile = _pick_tile(total)
    return pl.pallas_call(
        functools.partial(_moments_kernel, C=C),
        grid=(B, total // tile),
        in_specs=[
            pl.BlockSpec((1, chpp, T_local, tile), lambda b, t: (b, 0, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, M, tile), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M, total), jnp.float32),
        interpret=interpret,
    )(x)


@functools.partial(
    jax.jit,
    static_argnames=("T", "n_imgs", "h", "w", "cls_cnt", "layer_id", "interpret"),
)
def epistemic_finalize(
    moments, priors_hw, *, T: int, h: int, w: int, cls_cnt: int, layer_id: int,
    n_imgs: int = 1, interpret: bool = False,
):
    """Global moment sums -> decoded epistemic rows.

    moments (B, 21+C, n_imgs*h*w) f32 (psum of ``epistemic_moments_cf``
    shards) -> (n_imgs, B*h*w, 21+C), rows in the reference concat order per
    image (same output contract as ``fused_epistemic_decode_cf_batched``).
    """
    B, M, total = moments.shape
    C = cls_cnt
    assert M == 21 + C, (M, C)
    hw = h * w
    assert total == n_imgs * hw
    width = 21 + C

    ys = jnp.tile(
        jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(1, hw), (1, n_imgs)
    )
    xs = jnp.tile(
        jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(1, hw), (1, n_imgs)
    )
    tile = _pick_tile(total)
    out = pl.pallas_call(
        functools.partial(
            _finalize_kernel, T=T, C=C, lw=float(w), lh=float(h), layer_id=layer_id
        ),
        grid=(B, total // tile),
        in_specs=[
            pl.BlockSpec((1, M, tile), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda b, t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda b, t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 2), lambda b, t: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, width, tile), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, width, total), jnp.float32),
        interpret=interpret,
    )(moments.astype(jnp.float32), xs, ys, priors_hw.astype(jnp.float32))

    out = out.reshape(B, width, n_imgs, hw)
    return out.transpose(2, 0, 3, 1).reshape(n_imgs, B * hw, width)


def _pick_tile(hw: int) -> int:
    for tile in (2048, 1024, 512, 256, 128):
        if hw % tile == 0:
            return tile
    return hw  # tiny grids (tests): one tile, padded internally by mosaic


def _run(x, h, w, priors_hw, *, cls_cnt, layer_id, interpret):
    """x: (B, chpp, T, hw) f32 anchor-minor fields -> (h, w, B, width)."""
    B, chpp, T, hw = x.shape
    C = cls_cnt
    assert chpp == 2 * (5 + C), (chpp, C)
    width = 21 + C

    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(1, hw)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(1, hw)

    tile = _pick_tile(hw)
    grid = (B, hw // tile)

    out = pl.pallas_call(
        functools.partial(
            _kernel, T=T, C=C, lw=float(w), lh=float(h), layer_id=layer_id
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chpp, T, tile), lambda b, t: (b, 0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda b, t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda b, t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 2), lambda b, t: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, width, tile), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, width, hw), jnp.float32),
        interpret=interpret,
    )(x, xs, ys, priors_hw.astype(jnp.float32))

    # (B, width, hw) -> (h, w, B, width)
    return out.transpose(2, 0, 1).reshape(h, w, B, width)


@functools.partial(
    jax.jit, static_argnames=("cls_cnt", "layer_id", "interpret")
)
def fused_epistemic_decode(
    raw, priors_hw, *, cls_cnt: int, layer_id: int, interpret: bool = False
):
    """raw (T, h, w, B*chpp) f32 -> decoded (h, w, B, 21+C) f32.

    Drop-in replacement for split_detection + decode_epistemic_stats +
    decode_bbox_epistemic on the bayesian variant.  NOTE: the relayout
    transpose here costs more than the kernel; the fast path is
    ``fused_epistemic_decode_cf`` fed by models.yolov3.mc_forward_cf.
    """
    T, h, w, ch = raw.shape
    B = priors_hw.shape[0]
    hw = h * w
    # (T, h, w, B, chpp) -> (B, chpp, T, hw): anchors on the minor axis
    x = raw.reshape(T, hw, B, ch // B).transpose(2, 3, 0, 1).astype(jnp.float32)
    return _run(x, h, w, priors_hw, cls_cnt=cls_cnt, layer_id=layer_id,
                interpret=interpret)


@functools.partial(
    jax.jit, static_argnames=("h", "w", "cls_cnt", "layer_id", "interpret")
)
def fused_epistemic_decode_cf(
    raw_cf, priors_hw, *, h: int, w: int, cls_cnt: int, layer_id: int,
    interpret: bool = False
):
    """Channels-first fast path: raw_cf (B*chpp, T, hw) f32 (the native
    output layout of ops.common.detection_conv_cf) -> (h, w, B, 21+C).

    The reshape below is free — no data movement."""
    ch, T, hw = raw_cf.shape
    B = priors_hw.shape[0]
    assert hw == h * w
    x = raw_cf.reshape(B, ch // B, T, hw).astype(jnp.float32)
    return _run(x, h, w, priors_hw, cls_cnt=cls_cnt, layer_id=layer_id,
                interpret=interpret)


@functools.partial(
    jax.jit,
    static_argnames=("n_imgs", "h", "w", "cls_cnt", "layer_id", "interpret"),
)
def fused_epistemic_decode_cf_batched(
    raw_cf, priors_hw, *, n_imgs: int, h: int, w: int, cls_cnt: int,
    layer_id: int, interpret: bool = False
):
    """Image-batched epistemic decode: raw_cf (B*chpp, T, NB*hw) ->
    (NB, B*hw, width), rows in the reference's concat_bbox order per image.

    The image batch lives on the anchor (lane) axis; the kernel is
    identical — every statistic is per-anchor, and the grid offsets are
    tiled per image.  This is the framework extension lifting the
    reference's epistemic batch-1 limit (inference_epistemic.py:193)."""
    ch, T, total = raw_cf.shape
    B = priors_hw.shape[0]
    hw = h * w
    assert total == n_imgs * hw
    C = cls_cnt
    width = 21 + C
    x = raw_cf.reshape(B, ch // B, T, total).astype(jnp.float32)

    ys = jnp.tile(
        jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(1, hw), (1, n_imgs)
    )
    xs = jnp.tile(
        jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(1, hw), (1, n_imgs)
    )

    tile = _pick_tile(total)
    grid = (B, total // tile)
    chpp = ch // B
    out = pl.pallas_call(
        functools.partial(
            _kernel, T=T, C=C, lw=float(w), lh=float(h), layer_id=layer_id
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chpp, T, tile), lambda b, t: (b, 0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda b, t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda b, t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 2), lambda b, t: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, width, tile), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, width, total), jnp.float32),
        interpret=interpret,
    )(x, xs, ys, priors_hw.astype(jnp.float32))

    # (B, width, NB*hw) -> (NB, B*hw, width)
    out = out.reshape(B, width, n_imgs, hw)
    return out.transpose(2, 0, 3, 1).reshape(n_imgs, B * hw, width)
