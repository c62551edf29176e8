"""Fused MC-dropout detection-head kernels (channels-first flat layout).

WHY: the bayesian variant's T=30 dropout-bearing head section dominates the
headline epistemic pipeline (~41 of ~49 ms/img).  The Bernoulli masks are
free to COMPUTE (a fused elementwise hash, ops/common.py:dropout), but XLA
emits any runtime-keyed mask as a separate full-tensor elementwise pass over
~1.4e9 head activations per image — a fixed ~8.7 ms/img of pure HBM traffic
(BENCH_NOTES.md round-3 dead-end log: the cost is invariant to hash op
count, and a standalone mask-epilogue kernel pays an extra HBM round trip
instead).  The only way to eliminate it is to apply the mask while the
activations are still in VMEM: these kernels compute conv + dropout mask +
BN + LeakyReLU in one pass, evaluating the mask in-register from the global
NHWC flat index.  The draws are BIT-IDENTICAL to the XLA path
(ops.common.hash_keep with the same per-(sample, site) keys), so the Pallas
head path computes the same function as ``models.yolov3._heads`` up to
float reduction order.

Layout: the flat channels-first chain convention of ops/pallas_conv.py —
``(C, (rows + 2*PAD) * WP)`` per sample with PAD zero rows above/below and
zeroed dead columns (>= w_real); WP is the row width padded to a power of
two so in-kernel row/col index math reduces to shifts and masks.  Kernel
menu (chosen per stage by arithmetic-intensity / VMEM budget):

* ``fused_conv1x1_cf`` — a BlockSpec-pipelined matmul + epilogue.  Used for
  head-1's 1x1 convs (cin/cout 512/1024: compute-bound even standalone) and
  the scale-transition convs.
* ``fused_conv3x3_cf`` — halo-DMA 3x3 (taps K-stacked on the contracting
  dimension, pallas_conv style) + epilogue, with the 1x1 detection conv
  optionally fused on top (the conv5+det tail never materializes conv5's
  output).  Used for head-1's 3x3 convs, whose (3, 1024, 1536) weights
  leave no VMEM room for pair fusion.
* ``fused_head_pair_cf`` — 1x1-reduce + 3x3-expand fused in VMEM, optional
  second input (the skip concat becomes a split matmul: conv(concat(a, b))
  == Wa@a + Wb@b), optional fused detection conv + branch output.  Used for
  heads 2/3, whose small channels (128-512) would make standalone 1x1 convs
  HBM-bound (arithmetic intensity cin*cout/(cin+cout) < 128 flop/byte).

Dropout ordering parity: mask applies to the raw conv output BEFORE the BN
affine (reference yolov3.py:524-528); the 1/keep rescale is folded into the
BN scale, so the epilogue is one masked multiply-add:
``y = where(keep, conv * scale/keep + bias, bias)`` -> LeakyReLU.

Reference parity: composition per lib_yolo/layers.py:505-574 (conv/BN eps
1e-5/LeakyReLU 0.1) with dropout yolov3.py:543-551; these kernels are a
backend swap below models/yolov3.py — structure, weights, statistics and
mask draws unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import KEEP_THRESH_16, hash_keep
from .pallas_conv import PAD, _bn_vec, _leaky, _mm, _prep_3x3_weights, _roll_cols

HT = 8  # default output rows per grid tile

_INV_KEEP = 1.0 / 0.9  # DROP_PROB is 0.1 everywhere in the reference


def _epilogue(acc, scale, bias, key, *, wp, w_real, h, row0):
    """[mask] + BN affine + LeakyReLU + zero dead cols / out-of-image rows.

    acc: (cout, P) f32 raw conv output for rows [row0, row0 + P/wp) (global
    image coordinates; may include out-of-image halo rows, which are zeroed
    here).  key: u32 scalar (dropout site key) or None.  Returns bf16.
    """
    cout, P = acc.shape
    # mirror the XLA path's bf16 conv output before the f32 normalize
    y = acc.astype(jnp.bfloat16).astype(jnp.float32)
    p1 = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    col1 = p1 & (wp - 1)
    row1 = (p1 >> (wp.bit_length() - 1)) + row0
    if key is not None:
        # NHWC flat index of ops.common.dropout: ((row*W + col)*C + c)
        c = jax.lax.broadcasted_iota(jnp.int32, (cout, P), 0)
        pix = (row1 * w_real + col1) * cout
        idx = (pix + c).astype(jnp.uint32)
        keep = hash_keep(idx, key, jnp.uint32(KEEP_THRESH_16))
        mult = jnp.where(keep, scale * _INV_KEEP, 0.0)
    else:
        mult = scale
    y = _leaky(y * mult + bias)
    ok = (col1 < w_real) & (row1 >= 0) & (row1 < h)
    return jnp.where(ok, y, 0.0).astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# 1x1 conv (+ mask + BN + leaky): BlockSpec-pipelined matmul
# ---------------------------------------------------------------------------


def _c11_kernel(x, keys, w, s, b, out, acc_s, *, wp, w_real, h, drop, ht,
                hoist):
    j = pl.program_id(0)
    t = pl.program_id(1)
    if hoist:
        # shared input: the raw conv output is sample-invariant — compute
        # it once per tile (t == 0), epilogue per sample (mask varies)
        @pl.when(t == 0)
        def _():
            acc_s[...] = _mm(w[...], x[0])

        acc = acc_s[...]
    else:
        acc = _mm(w[...], x[0])
    key = keys[0, 0, 0] if drop else None
    out[0] = _epilogue(acc, s[...], b[...], key,
                       wp=wp, w_real=w_real, h=h, row0=j * ht - PAD)


@functools.partial(
    jax.jit, static_argnames=("h", "w_real", "wp", "drop", "interpret")
)
def fused_conv1x1_cf(x, w, bn, keys, *, h, w_real, wp, drop=True,
                     interpret=False):
    """1x1 conv + [dropout site] + BN + LeakyReLU on the flat CF layout.

    x: (Tx, cin, (h+2*PAD)*wp) bf16 chain convention.  w: (1,1,cin,cout)
    HWIO.  bn: (scale, bias).  keys: (T, 2, 128) u32 (site key broadcast in
    [:, 0, :]; ignored when ``drop`` is False — pass zeros).  When Tx == 1
    the input is shared across the T samples (e.g. the backbone output) and
    — the grid being tile-major, samples minor — both the input block and
    the raw conv result stay resident in VMEM across the T samples: the
    matmul runs once per tile, only the mask epilogue runs per sample.
    Returns (T, cout, (h+2*PAD)*wp) bf16.
    """
    tx, cin, L = x.shape
    t_total = keys.shape[0]
    cout = w.shape[3]
    ht = HT
    assert h % ht == 0 and (ht * wp) % 128 == 0 and wp & (wp - 1) == 0
    n_blk = (h + 2 * PAD) // ht
    w2 = jnp.transpose(w[0, 0], (1, 0)).astype(jnp.bfloat16)
    s, b = _bn_vec(bn)
    hoist = tx == 1 and t_total > 1
    xi = (lambda j, t: (0, 0, j)) if tx == 1 else (lambda j, t: (t, 0, j))
    return pl.pallas_call(
        functools.partial(_c11_kernel, wp=wp, w_real=w_real, h=h, drop=drop,
                          ht=ht, hoist=hoist),
        grid=(n_blk, t_total),
        in_specs=[
            pl.BlockSpec((1, cin, ht * wp), xi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 128), lambda j, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cout, ht * wp), lambda j, t: (t, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_total, cout, L), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((cout, ht * wp), jnp.float32)],
        interpret=interpret,
    )(x, keys, w2, s, b)


# ---------------------------------------------------------------------------
# layout fence
# ---------------------------------------------------------------------------


def _fence_kernel(x, o):
    o[...] = x[...]


def layout_fence(x, interpret=False):
    """Identity through a pallas_call — a LAYOUT firewall.

    The head section consumes backbone activations through NHWC->CF
    transposes (pack_nhwc_to_flat_cf).  Left alone, XLA's layout
    assignment propagates those transposes backward and picks degenerate
    conv layouts for the whole >=256-channel backbone ({3,0,2,1:T(1,128)}
    with per-conv 31.5 MB f32 converts — measured ~+15 ms/img;
    lax.optimization_barrier does NOT stop layout propagation).  A custom
    call's operand layout constraint does.  Cost: one streamed copy.
    """
    n, h, w, c = x.shape
    bh = 8 if h % 8 == 0 else 1
    return pl.pallas_call(
        _fence_kernel,
        grid=(n, h // bh),
        in_specs=[pl.BlockSpec((1, bh, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, bh, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x)


# ---------------------------------------------------------------------------
# scale transition: 1x1 conv + BN + leaky + 2x nearest upsample, one kernel
# ---------------------------------------------------------------------------
#
# The XLA reshape/broadcast upsample costs ~2.5 ms/transition at T=30 ECP
# scale AND leaves the result in a layout the consuming pallas_call must
# copy-normalize (~45 GB/s single-stream, another ~3.5 ms measured inside
# the consumer's delta).  In-kernel, column duplication is one one-hot MXU
# matmul against a block-diagonal expand matrix and row duplication is two
# aligned stores per low-res row.


def _trans_up_kernel(x, w, s, b, s4, out, *, wp, w_real, h, ht):
    j = pl.program_id(1)
    wp2 = 2 * wp
    # output tile = hi-res image rows R .. R+ht-1, R = j*ht - PAD (even);
    # input block = low-res rows R/2 .. R/2 + ht/2 - 1.  Pad-row tiles need
    # no special casing: the epilogue's row mask zeroes them.
    acc = _mm(w[...], x[0])
    t = _epilogue(acc, s[...], b[...], None,
                  wp=wp, w_real=w_real, h=h, row0=(j * ht - PAD) // 2)
    # column-duplicate all ht/2 low-res rows at once: one block-diagonal
    # one-hot matmul (exact: each output element is a single 1.0 product)
    e = jax.lax.dot_general(
        t, s4[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    for q in range(ht // 2):
        seg = e[:, q * wp2:(q + 1) * wp2]
        out[0, :, (2 * q) * wp2:(2 * q + 1) * wp2] = seg
        out[0, :, (2 * q + 1) * wp2:(2 * q + 2) * wp2] = seg


@functools.partial(
    jax.jit, static_argnames=("h", "w_real", "wp", "interpret")
)
def fused_trans_upsample_cf(x, w, bn, *, h, w_real, wp, interpret=False):
    """Scale-transition conv (1x1 + BN + leaky, no dropout) + 2x nearest
    upsample (reference layers.py:578-580, yolov3.py:585-593), flat CF.

    x: (T, c1, (h+2*PAD)*wp) bf16 chain convention (low resolution).
    Returns (T, c2, (2h+2*PAD)*(2*wp)) bf16 chain convention — the
    upsample-half input of the next head's pair01 (dead cols >= 2*w_real
    and pad rows zeroed by construction).
    """
    t_total, c1, _ = x.shape
    c2 = w.shape[3]
    ht = HT
    assert h % ht == 0 and (2 * PAD) % ht == 0
    assert (4 * wp) % 128 == 0 and wp & (wp - 1) == 0
    w2 = jnp.transpose(w[0, 0], (1, 0)).astype(jnp.bfloat16)
    s, b = _bn_vec(bn)
    # block-diagonal column expander: rows ht/2 x wp, cols ht/2 x 2*wp;
    # S4[q*wp + c, q*2*wp + 2c + b] = 1 for b in {0, 1}
    import numpy as _np

    s4 = _np.zeros(((ht // 2) * wp, (ht // 2) * 2 * wp), _np.float32)
    q_ = _np.repeat(_np.arange(ht // 2), wp)
    c_ = _np.tile(_np.arange(wp), ht // 2)
    for bcol in (0, 1):
        s4[q_ * wp + c_, q_ * 2 * wp + 2 * c_ + bcol] = 1.0
    s4 = jnp.asarray(s4, jnp.bfloat16)
    n_blk = (2 * h + 2 * PAD) // ht
    return pl.pallas_call(
        functools.partial(_trans_up_kernel, wp=wp, w_real=w_real, h=h,
                          ht=ht),
        grid=(t_total, n_blk),
        in_specs=[
            pl.BlockSpec((1, c1, (ht // 2) * wp),
                         lambda t, j: (t, 0, j + 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c2, ht * 2 * wp), lambda t, j: (t, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (t_total, c2, (2 * h + 2 * PAD) * 2 * wp), jnp.bfloat16),
        interpret=interpret,
    )(x, w2, s, b, s4)


# ---------------------------------------------------------------------------
# shared halo-DMA helpers (pair / 3x3 kernels)
# ---------------------------------------------------------------------------
#
# Grid tiling: block j of the (h + 2*PAD)-row flat tensor covers image rows
# R0 = j*ht - PAD .. R0+ht-1; interior blocks are j in [PAD//ht,
# PAD//ht + h//ht); edge blocks are the zero pad rows.  Input tiles are
# fetched with a TWO-row top halo (rows R0-2 .. R0+ht+1): starting one row
# earlier than the 3x3 needs keeps the HBM offset (j*ht - 2) * wp a lane
# multiple for ANY power-of-two wp >= 64 (with ht even), where the natural
# R0-1 start would misalign at wp == 64.  The 3x3 taps then read rows
# (1+di) of the fetched extent; at wp == 64 those offsets are not
# lane-aligned, so the patch fill switches to single combined (row, col)
# rolls, which Mosaic handles at any shift.


def _prep_w33(w, wp):
    """3x3 weights in the layout _conv3x3_from_halo2 wants for this wp:
    K-stacked (3, cout, 3*cin) when tap offsets are lane-aligned, else
    per-tap (9, cout, cin) indexed [di*3 + dj + 1 - 1]."""
    if wp % 128 == 0:
        return _prep_3x3_weights(w)
    w9 = jnp.transpose(w, (0, 1, 3, 2))  # (di, dj, cout, cin)
    return w9.reshape(9, w.shape[3], w.shape[2]).astype(jnp.bfloat16)


def _conv3x3_from_halo2(w, t, wp, tp, patches):
    """3x3 conv from a (rows R0-2 .. R0+ht+1) extent, f32 accumulator.

    Lane-aligned wp (>= 128): taps K-stacked into the patches scratch, one
    (cout, 3*cin) matmul per column tap.  wp == 64: tap offsets are not
    lane-aligned, so each of the nine taps is one combined (row, col) roll
    + a (cout, cin) matmul — no patches scratch (which also keeps the
    1024-channel head-1 kernels inside the 16 MB scoped-VMEM budget).
    """
    cmid = t.shape[0]
    acc = None
    if wp % 128 == 0:
        for dj in (-1, 0, 1):
            xr = _roll_cols(t, dj)
            for di in range(3):
                patches[di * cmid:(di + 1) * cmid, :] = (
                    xr[:, (1 + di) * wp:(1 + di) * wp + tp]
                )
            term = _mm(w[dj + 1], patches[...])
            acc = term if acc is None else acc + term
    else:
        for di in range(3):
            for dj in (-1, 0, 1):
                xr = _roll_cols(t, dj + (1 + di) * wp)
                term = _mm(w[di * 3 + dj + 1], xr[:, :tp])
                acc = term if acc is None else acc + term
    return acc


def _patches_shape(wp, cin, tp):
    """VMEM scratch for the K-stacked path; a dummy tile when unused."""
    return (3 * cin, tp) if wp % 128 == 0 else (8, 128)


def _halo_dma(x_hbm, x_s, sem, i1, jj, wp, ht):
    # rows R0-2 .. R0+ht+1 with R0 = jj*ht - PAD (padded offset jj*ht - 2).
    # The offset is phrased as <idx> * 128 so Mosaic can PROVE lane-tiling
    # divisibility (the equivalent (jj*ht - 2) * wp form fails the prover).
    start128 = jj * ((ht * wp) // 128) - (2 * wp) // 128
    return pltpu.make_async_copy(
        x_hbm.at[i1, :, pl.ds(start128 * 128, (ht + 4) * wp)], x_s, sem,
    )


# ---------------------------------------------------------------------------
# 3x3 conv (+ mask + BN + leaky) [+ fused 1x1 detection conv]
# ---------------------------------------------------------------------------


def _c33_kernel(x_hbm, keys, w, s, b, wd, bd, *rest, wp, w_real, h, ht,
                drop, det, shared_x, t_total):
    if det:
        (out_det, det_s, det_sem, x_s, patches, sems) = rest
    else:
        (out_y, x_s, patches, sems) = rest
    j = pl.program_id(0)
    t = pl.program_id(1)
    tp = ht * wp
    fi = PAD // ht               # first / last interior block
    li = fi + h // ht - 1
    interior = (j >= fi) & (j <= li)

    def dma(tt, slot):
        return _halo_dma(x_hbm, x_s.at[slot], sems.at[slot],
                         0 if shared_x else tt, j, wp, ht)

    if shared_x:
        # one fetch per tile, resident across all T samples
        @pl.when(interior & (t == 0))
        def _():
            cp = dma(0, 0)
            cp.start()
            cp.wait()
    else:
        @pl.when(interior & (t == 0))
        def _():
            dma(0, 0).start()

        @pl.when(interior & (t + 1 <= t_total - 1))
        def _():
            dma(t + 1, (t + 1) % 2).start()

    @pl.when(jnp.logical_not(interior))
    def _():
        if det:
            det_s[...] = jnp.zeros_like(det_s[...])
        else:
            out_y[0] = jnp.zeros_like(out_y[0])

    @pl.when(interior)
    def _():
        if shared_x:
            xv = x_s[0]
        else:
            dma(t, t % 2).wait()
            xv = x_s[t % 2]
        acc = _conv3x3_from_halo2(w, xv, wp, tp, patches)
        key = keys[0, 0, 0] if drop else None
        y = _epilogue(acc, s[...], b[...], key,
                      wp=wp, w_real=w_real, h=h, row0=j * ht - PAD)
        if det:
            det_s[...] = _mm(wd[...], y) + bd[...]
        else:
            out_y[0] = y

    if det:
        # (chp, T*L) HBM det output via a manual lane-offset box copy
        # (sample-major pixel planes; lane start = t*L + j*tp, phrased in
        # 128-lane units so Mosaic can prove tiling divisibility)
        L = ((h + 2 * PAD) // ht) * tp
        start128 = t * (L // 128) + j * (tp // 128)
        cp = pltpu.make_async_copy(
            det_s, out_det.at[:, pl.ds(start128 * 128, tp)], det_sem)
        cp.start()
        cp.wait()


@functools.partial(
    jax.jit,
    static_argnames=("h", "w_real", "wp", "ht", "drop", "det_ch",
                     "interpret"),
)
def fused_conv3x3_cf(x, w, bn, keys, *, h, w_real, wp, ht=HT, drop=True,
                     det_w=None, det_b=None, det_ch=None, interpret=False):
    """3x3 SAME conv + [dropout site] + BN + LeakyReLU, flat CF layout.

    x: (Tx, cin, (h+2*PAD)*wp) bf16 chain convention (Tx == 1 -> shared,
    fetched once per tile and held across the T samples).  w: (3,3,cin,
    cout) HWIO.  With ``det_w/det_b/det_ch`` the 1x1 linear detection conv
    (layers.py:600-613) is fused on top and the kernel emits ONLY the
    detection output, laid out (det_ch_pad, T*L) f32 — sample-major pixel
    planes so the downstream (ch, T, hw) decoder view needs a slice but NO
    transpose.  Otherwise returns (T, cout, L) bf16.
    """
    tx, cin, L = x.shape
    t_total = keys.shape[0]
    cout = w.shape[3]
    assert h % ht == 0 and PAD % ht == 0
    assert (ht * wp) % 128 == 0 and wp & (wp - 1) == 0
    n_tiles = (h + 2 * PAD) // ht
    w2 = _prep_w33(w, wp)
    s, b = _bn_vec(bn)
    det = det_ch is not None
    if det:
        chp = -(-det_ch // 8) * 8
        wd = jnp.zeros((chp, cout), jnp.bfloat16)
        wd = wd.at[:det_ch].set(
            jnp.transpose(det_w[0, 0], (1, 0)).astype(jnp.bfloat16))
        bd = jnp.zeros((chp, 1), jnp.float32).at[:det_ch, 0].set(
            det_b.astype(jnp.float32))
        out_shape = jax.ShapeDtypeStruct((chp, t_total * L), jnp.float32)
        out_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        det_scratch = [pltpu.VMEM((chp, ht * wp), jnp.float32),
                       pltpu.SemaphoreType.DMA]
    else:
        wd = jnp.zeros((8, cout), jnp.bfloat16)
        bd = jnp.zeros((8, 1), jnp.float32)
        out_shape = jax.ShapeDtypeStruct((t_total, cout, L), jnp.bfloat16)
        out_spec = pl.BlockSpec((1, cout, ht * wp), lambda j, t: (t, 0, j),
                                memory_space=pltpu.VMEM)
        det_scratch = []
    return pl.pallas_call(
        functools.partial(_c33_kernel, wp=wp, w_real=w_real, h=h, ht=ht,
                          drop=drop, det=det, shared_x=tx == 1,
                          t_total=t_total),
        grid=(n_tiles, t_total),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, 2, 128), lambda j, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=det_scratch + [
            pltpu.VMEM((2, cin, (ht + 4) * wp), jnp.bfloat16),
            pltpu.VMEM(_patches_shape(wp, cin, ht * wp), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, keys, w2, s, b, wd, bd)


# ---------------------------------------------------------------------------
# fused pair: 1x1 reduce (+mask) + 3x3 expand (+mask) [+ det conv + branch]
# ---------------------------------------------------------------------------


def _halo_dma_s(x_hbm, x_s, sem, t0, st, jj, wp, ht):
    """S-sample halo fetch: samples [t0, t0+st), rows R0-2 .. R0+ht+1."""
    start128 = jj * ((ht * wp) // 128) - (2 * wp) // 128
    return pltpu.make_async_copy(
        x_hbm.at[pl.ds(t0, st), :, pl.ds(start128 * 128, (ht + 4) * wp)],
        x_s, sem,
    )


def _pair_kernel(x1_hbm, x2_hbm, keys, wa1, wa2, sa, ba, wb, sb, bb, wd, bd,
                 *rest, wp, w_real, h, ht, drop_a, drop_b, det, branch,
                 has_x2, shared_x1, n_sblk, st):
    if det:
        out_det = rest[0]
        outs = rest[1:1 + branch]
        (det_s, det_sem, x1_s, x2_s, acc2_s, patches, sems) = (
            rest[1 + branch:])
    else:
        out_det = None
        outs = rest[:1]
        (x1_s, x2_s, acc2_s, patches, sems) = rest[1:]
    j = pl.program_id(0)
    ts = pl.program_id(1)        # sample-block index: samples ts*st ..
    tp = ht * wp
    fi = PAD // ht               # first / last interior block
    li = fi + h // ht - 1
    interior = (j >= fi) & (j <= li)

    def dma1(tt, slot):
        return _halo_dma_s(x1_hbm, x1_s.at[slot], sems.at[slot, 0],
                           0 if shared_x1 else tt * st,
                           1 if shared_x1 else st, j, wp, ht)

    def dma2():
        return _halo_dma(x2_hbm, x2_s.at[0], sems.at[0, 1], 0, j, wp, ht)

    @pl.when(interior & (ts == 0))
    def _():
        dma1(0, 0).start()
        if has_x2:
            # x2 is SHARED: fetch once per tile, and hoist its 1x1 product
            # into scratch — it is sample-invariant
            cp = dma2()
            cp.start()
            cp.wait()
            acc2_s[...] = _mm(wa2[...], x2_s[0])

    @pl.when(interior & (ts + 1 <= n_sblk - 1))
    def _():
        dma1(ts + 1, (ts + 1) % 2).start()

    @pl.when(jnp.logical_not(interior))
    def _():
        if det:
            det_s[...] = jnp.zeros_like(det_s[...])
        for o in outs:
            o[...] = jnp.zeros_like(o[...])

    @pl.when(interior)
    def _():
        dma1(ts, ts % 2).wait()
        for s in range(st):
            acc = _mm(wa1[...], x1_s[ts % 2, 0 if shared_x1 else s])
            if has_x2:
                acc = acc + acc2_s[...]
            key_a = keys[s, 0, 0] if drop_a else None
            # the fetched extent covers rows R0-2 .. R0+ht+1 (_halo_dma_s)
            tmid = _epilogue(acc, sa[...], ba[...], key_a,
                             wp=wp, w_real=w_real, h=h,
                             row0=j * ht - PAD - 2)
            acc2 = _conv3x3_from_halo2(wb, tmid, wp, tp, patches)
            key_b = keys[s, 1, 0] if drop_b else None
            y = _epilogue(acc2, sb[...], bb[...], key_b,
                          wp=wp, w_real=w_real, h=h, row0=j * ht - PAD)
            if det:
                det_s[s] = _mm(wd[...], y) + bd[...]
                if branch:
                    # conv-a's activation, center rows R0 .. R0+ht-1
                    outs[0][s] = tmid[:, 2 * wp:2 * wp + tp]
            else:
                outs[0][s] = y

    if det:
        # (chp, T*L) HBM det output via manual lane-offset box copies —
        # sample-major pixel planes (lane start = t*L + j*tp); one DMA per
        # sample in the block, started together, waited together
        L = ((h + 2 * PAD) // ht) * tp
        cps = []
        for s in range(st):
            start128 = (ts * st + s) * (L // 128) + j * (tp // 128)
            cps.append(pltpu.make_async_copy(
                det_s.at[s], out_det.at[:, pl.ds(start128 * 128, tp)],
                det_sem))
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()


@functools.partial(
    jax.jit,
    static_argnames=("h", "w_real", "wp", "ht", "st", "drop_a", "drop_b",
                     "det_ch", "branch", "interpret"),
)
def fused_head_pair_cf(x1, x2, wa, bna, wb, bnb, keys, *, h, w_real, wp,
                       ht=HT, st=1, drop_a=True, drop_b=True, det_w=None,
                       det_b=None, det_ch=None, branch=False,
                       interpret=False):
    """Fused (1x1 reduce + 3x3 expand) head conv pair, flat CF layout.

    x1: (Tx, c1, (h+2*PAD)*wp) bf16; x2: optional (1, c2, ...) SHARED
    second input — the skip-concat half: conv0(concat(x1, x2)) splits into
    Wa1@x1 + Wa2@x2 with Wa = (1,1, c1+c2, cmid) HWIO split on the input-
    channel axis (x1 channels first, matching the reference concat order
    upsample-then-skip, yolov3.py:585-599).  wb: (3,3,cmid,cb).

    With ``det_*`` set, the 1x1 detection conv is fused on top (emits
    (det_ch_pad, T*L) f32 instead of the 3x3 activation); ``branch=True``
    additionally emits conv-a's activation (T, cmid, L) bf16 (the scale-
    branch feeding the next head's transition conv, reference route [-3]).

    ``st`` — samples per grid step.  The small-channel heads run hundreds
    of tiny grid steps whose fixed cost (sequencer + DMA boundary, ~5 us)
    dwarfs their ~2 us of MXU work; batching ``st`` samples behind ONE
    halo fetch and ONE sequencer boundary amortizes it st-fold (measured:
    head-2/3 pair sections 3-5x faster at st=6/3).  Choose st so the
    (2, st, c1, (ht+4)*wp) input scratch plus (2*st)-buffered output
    blocks stay inside the 16 MB scoped-VMEM budget.
    """
    tx, c1, L = x1.shape
    t_total = keys.shape[0]
    cmid = wa.shape[3]
    cb = wb.shape[3]
    has_x2 = x2 is not None
    c2 = x2.shape[1] if has_x2 else 8
    assert wa.shape[2] == c1 + (x2.shape[1] if has_x2 else 0)
    assert h % ht == 0 and PAD % ht == 0
    assert (ht * wp) % 128 == 0 and wp & (wp - 1) == 0
    assert t_total % st == 0, (t_total, st)
    n_tiles = (h + 2 * PAD) // ht
    n_sblk = t_total // st
    wa1 = jnp.transpose(wa[0, 0, :c1], (1, 0)).astype(jnp.bfloat16)
    wa2 = (jnp.transpose(wa[0, 0, c1:], (1, 0)).astype(jnp.bfloat16)
           if has_x2 else jnp.zeros((cmid, 8), jnp.bfloat16))
    sa, ba = _bn_vec(bna)
    sb, bb = _bn_vec(bnb)
    w2 = _prep_w33(wb, wp)
    det = det_ch is not None
    if det:
        chp = -(-det_ch // 8) * 8
        wd = jnp.zeros((chp, cb), jnp.bfloat16).at[:det_ch].set(
            jnp.transpose(det_w[0, 0], (1, 0)).astype(jnp.bfloat16))
        bd = jnp.zeros((chp, 1), jnp.float32).at[:det_ch, 0].set(
            det_b.astype(jnp.float32))
        out_shapes = [jax.ShapeDtypeStruct((chp, t_total * L), jnp.float32)]
        out_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
        if branch:
            out_shapes.append(
                jax.ShapeDtypeStruct((t_total, cmid, L), jnp.bfloat16))
            out_specs.append(
                pl.BlockSpec((st, cmid, ht * wp), lambda j, ts: (ts, 0, j),
                             memory_space=pltpu.VMEM))
    else:
        assert not branch
        wd = jnp.zeros((8, cb), jnp.bfloat16)
        bd = jnp.zeros((8, 1), jnp.float32)
        out_shapes = [jax.ShapeDtypeStruct((t_total, cb, L), jnp.bfloat16)]
        out_specs = [pl.BlockSpec((st, cb, ht * wp), lambda j, ts: (ts, 0, j),
                                  memory_space=pltpu.VMEM)]
    if not has_x2:
        x2 = jnp.zeros((1, 8, L), jnp.bfloat16)
    out = pl.pallas_call(
        functools.partial(_pair_kernel, wp=wp, w_real=w_real, h=h, ht=ht,
                          drop_a=drop_a, drop_b=drop_b, det=det,
                          branch=det and branch, has_x2=has_x2,
                          shared_x1=tx == 1, n_sblk=n_sblk, st=st),
        grid=(n_tiles, n_sblk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((st, 2, 128), lambda j, ts: (ts, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=([
            pltpu.VMEM((st, chp, ht * wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ] if det else []) + [
            pltpu.VMEM((2, 1 if tx == 1 else st, c1, (ht + 4) * wp),
                       jnp.bfloat16),
            pltpu.VMEM((1, c2, (ht + 4) * wp), jnp.bfloat16),
            pltpu.VMEM((cmid, (ht + 4) * wp) if has_x2 else (8, 128),
                       jnp.float32),
            pltpu.VMEM(_patches_shape(wp, cmid, ht * wp), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(x1, x2, keys, wa1, wa2, sa, ba, w2, sb, bb, wd, bd)
    return out if (det and branch) else out[0]
