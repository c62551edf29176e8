"""Fused Pallas kernel: batched standard/aleatoric bbox decode.

Companion to ops/pallas_epistemic.py for the per-sample (non-epistemic)
decoders (layers.py:191-346): sigmoid/exp anchor decode, aleatoric
variance transforms, entropies and layer/prior ids, computed in one pass
with anchors on the 128-lane axis.  Input is the channels-first layout
produced by ops.common.detection_conv_cf: (ch, batch, h*w) f32.

Output is already flattened in the reference's concat order
(inference_*.py concat_bbox: prior-major, then row-major cells):
(batch, B*h*w, width).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_epistemic import _pick_tile, _xlogx


def _kernel(x_ref, xoff_ref, yoff_ref, pri_ref, out_ref, *, C, lw, lh,
            layer_id, aleatoric):
    """Grid cell = (prior b, anchor tile).

    x_ref: (1, chpp, nb, tile); xoff/yoff: (1, tile);
    pri_ref: (B, 2) SMEM; out_ref: (1, width, nb, tile).
    """
    x = x_ref[0]  # (chpp, nb, tile)
    b_idx = pl.program_id(0)
    ph = pri_ref[b_idx, 0]
    pw = pri_ref[b_idx, 1]

    bx = (xoff_ref[0][None] + jax.nn.sigmoid(x[0])) * (1.0 / lw)  # (nb, tile)
    by = (yoff_ref[0][None] + jax.nn.sigmoid(x[1])) * (1.0 / lh)
    bw = jnp.exp(x[2]) * pw
    bh = jnp.exp(x[3]) * ph
    w2, h2 = bw * 0.5, bh * 0.5

    if aleatoric:
        obj = jax.nn.sigmoid(x[8])
        cls_logits = [x[10 + c] for c in range(C)]
    else:
        obj = jax.nn.sigmoid(x[4])
        cls_logits = [x[5 + c] for c in range(C)]

    cmax = cls_logits[0]
    for c in range(1, C):
        cmax = jnp.maximum(cmax, cls_logits[c])
    exps = [jnp.exp(l - cmax) for l in cls_logits]
    denom = exps[0]
    for e in exps[1:]:
        denom = denom + e
    cls = [e / denom for e in exps]

    rows = [by - h2, bx - w2, by + h2, bx + w2]
    if aleatoric:
        loc_var = [jnp.exp(x[4 + j]) for j in range(4)]
        total = loc_var[0] * loc_var[1] * loc_var[2] * loc_var[3]
        obj_ent = -(_xlogx(obj) + _xlogx(1.0 - obj))
        cls_ent = jnp.zeros_like(obj)
        for p in cls:
            cls_ent = cls_ent - _xlogx(p)
        rows += [*loc_var, total, obj, obj_ent, *cls, cls_ent,
                 jnp.full_like(obj, float(layer_id)),
                 jnp.full_like(obj, 1.0) * b_idx.astype(jnp.float32)]
    else:
        rows += [obj, *cls,
                 jnp.full_like(obj, float(layer_id)),
                 jnp.full_like(obj, 1.0) * b_idx.astype(jnp.float32)]
    out_ref[0] = jnp.stack(rows, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("h", "w", "cls_cnt", "layer_id", "aleatoric", "interpret"),
)
def fused_box_decode_cf(
    raw_cf,
    priors_hw,
    *,
    h: int,
    w: int,
    cls_cnt: int,
    layer_id: int,
    aleatoric: bool,
    interpret: bool = False,
):
    """raw_cf (B*chpp, batch, hw) f32 -> (batch, B*hw, width) f32.

    width = 14+C (aleatoric, layers.py:261-346) or 7+C (standard — the
    reference's 5+C plus real layer/prior id columns, see
    decode.decode_bbox_standard); rows are in the reference's concat_bbox
    order.
    """
    ch, nb, hw = raw_cf.shape
    B = priors_hw.shape[0]
    chpp = ch // B
    C = cls_cnt
    expected = 2 * (5 + C) if aleatoric else (5 + C)
    assert chpp == expected, (chpp, expected)
    width = (14 + C) if aleatoric else (7 + C)
    assert hw == h * w

    x = raw_cf.reshape(B, chpp, nb, hw).astype(jnp.float32)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(1, hw)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(1, hw)

    tile = _pick_tile(hw)
    # the kernel block holds (chpp in + width out) x nb x tile f32 in
    # VMEM, double-buffered; at large image batches the hw-only tile
    # pick blows the 16M scoped limit (measured: aleatoric batch 33 at
    # ECP stride-8 OOMs with tile=2048).  Halve the tile until the
    # block footprint fits an 8M budget (half the scoped limit, the
    # envelope the proven batch-11 config uses).  `tile % 256 == 0`
    # guards both divisibility of hw by the halved tile AND the Pallas
    # last-dim constraint (128-divisible) — on _pick_tile's fallback
    # path (tile == hw, not power-of-two) no halving happens and Mosaic
    # pads the single tile internally, as before.
    block_bytes = (chpp + width) * nb * 4 * 2
    while block_bytes * tile > 8 * 1024 * 1024 and tile % 256 == 0:
        tile //= 2
    grid = (B, hw // tile)

    out = pl.pallas_call(
        functools.partial(
            _kernel, C=C, lw=float(w), lh=float(h), layer_id=layer_id,
            aleatoric=aleatoric,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chpp, nb, tile), lambda b, t: (b, 0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda b, t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda b, t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 2), lambda b, t: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, width, nb, tile), lambda b, t: (b, 0, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, width, nb, hw), jnp.float32),
        interpret=interpret,
    )(x, xs, ys, priors_hw.astype(jnp.float32))

    # (B, width, nb, hw) -> (nb, B*hw, width), reference concat order
    return out.transpose(2, 0, 3, 1).reshape(nb, B * hw, width)


def fused_box_decode_all_scales(outs, priors_by_stride, *, spec,
                                interpret: bool = False):
    """All-scales batched decode: the one production sequence shared by
    the runner's fused branch, the dp-sharded pipeline (parallel/batch.py)
    and bench_all.

    ``outs``: [(raw_cf (ch, batch, h*w), (h, w)), ...] from
    models.yolov3.forward_cf / models.quant.forward_cf_q, scale order
    32/16/8.  Returns (batch, N_total, width) flat decoded rows in the
    reference concat order.
    """
    return jnp.concatenate(
        [
            fused_box_decode_cf(
                raw_cf, jnp.asarray(priors_by_stride[stride]),
                h=hw[0], w=hw[1], cls_cnt=spec.cls_cnt, layer_id=i,
                aleatoric=spec.aleatoric_head, interpret=interpret,
            )
            for i, ((raw_cf, hw), stride) in enumerate(
                zip(outs, (32, 16, 8))
            )
        ],
        axis=1,
    )
