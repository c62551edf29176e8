"""Fused channels-first Pallas conv kernels for the early backbone stages.

WHY: XLA lowers convolutions on TPU as per-tap matmuls whose contracting
dimension is ``cin`` — at the backbone's high-resolution low-channel
stages (cin 12..64) that fills 9..50% of the MXU's 128 contraction rows,
and measured MFU is 8-18% (BENCH_NOTES.md round-3 accounting: stem +
res64 + stage128 cost 5.4 ms/img of the 11.6 ms batch-11 step for only
124 GFLOP).  The >=256-channel stages hit ~60% MFU and stay on XLA.

HOW: a channels-first *flat-pixel* layout ``(C, rows*WP)`` where ``WP``
is the row width padded to a lane multiple (960 -> 1024, 480 -> 512):

* 1x1 convs are single matmuls ``(cout, cin) x (cin, pix)`` — pixels on
  the dense MXU output dimension, weights stationary.
* 3x3 convs run one matmul per column tap ``dj``: a lane-roll by ``-dj``
  of the input, three row taps stacked on the CONTRACTING dimension by
  lane-aligned column slices (a row shift is a slide by WP columns and
  WP is a multiple of 128), giving ``(cout, 3*cin) x (3*cin, pix)`` —
  K fills 96..192 MXU rows instead of cin.  The stem's tiny cin packs
  all nine taps into one K=9*cin matmul instead.
* BN affine + LeakyReLU epilogues, the residual add, and the stride-2
  column split all happen in VMEM: each kernel touches HBM once per
  tensor.

Chaining convention (zero XLA glue between kernels): every flat tensor
carries ``PAD=8`` zero rows above and below the image
(``(N, C, (rows + 16) * WP)``) and ZEROED dead columns (>= w_real).
Row halos then come from the pad rows, lane-rolls across row boundaries
read the zeroed dead columns (reproducing SAME zero padding for free),
and every grid tile is branch-free interior compute; the two edge tiles
of each launch just write the output's zero pad rows.  Inputs are
consumed via manual HBM->VMEM DMA because halo windows overlap, which
``BlockSpec`` cannot express.

Numerics: matmuls accumulate f32 (``preferred_element_type``), BN/leaky
in f32, activations stored bf16 — the same precision structure as the
XLA path (ops/common.py:conv_block at compute_dtype=bfloat16), so
results match the XLA backbone to bf16 reduction-order noise.

Reference parity: these kernels compute the exact conv + BN(eps 1e-5) +
LeakyReLU(0.1) composition of lib_yolo/layers.py:505-574 (stride-2
darknet (1,1)x(1,1) padding :616-635); they are a pure backend swap
below ``models/darknet.py`` — layer structure, weights and statistics
are unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import BN_EPS, LEAKY_ALPHA

PAD = 8  # zero pad rows carried above/below every flat tensor
HT = 8   # output rows per grid tile (== PAD so edge tiles are whole blocks)


def _leaky(x):
    return jnp.where(x >= 0, x, LEAKY_ALPHA * x)


def _mm(w, p):
    """(cout, K) x (K, pix) -> (cout, pix) f32 on the MXU."""
    return jax.lax.dot_general(
        w, p, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _roll_cols(x, dj):
    """shifted[:, p] = x[:, p + dj] along the flat pixel (lane) axis.

    pltpu.roll requires a non-negative shift; roll(x, s)[i] = x[i - s],
    so a read at p + dj is a roll by (n - dj) % n.
    """
    if dj == 0:
        return x
    n = x.shape[1]
    # Mosaic's rotate only handles 32-bit lanes: roll bf16 via f32
    if x.dtype == jnp.bfloat16:
        return pltpu.roll(x.astype(jnp.float32), (n - dj) % n,
                          axis=1).astype(jnp.bfloat16)
    return pltpu.roll(x, (n - dj) % n, axis=1)


def _conv3x3_acc(w_by_dj, x, wp, tp, patches):
    """SAME-padded 3x3 conv as 3 K-stacked matmuls, f32 accumulator.

    x: (cin, (n_out_rows + 2) * wp) covering rows [-1 .. n_out_rows];
    w_by_dj: (3, cout, 3*cin) with K index di*cin + c; patches: VMEM
    scratch (3*cin, tp); tp = n_out_rows * wp.
    """
    cin = x.shape[0]
    acc = None
    for dj in (-1, 0, 1):
        xr = _roll_cols(x, dj)
        for di in range(3):
            patches[di * cin:(di + 1) * cin, :] = xr[:, di * wp:di * wp + tp]
        term = _mm(w_by_dj[dj + 1], patches[...])
        acc = term if acc is None else acc + term
    return acc


def _col_mask(tp, wp, w_real):
    col = jax.lax.broadcasted_iota(jnp.int32, (1, tp), 1) % wp
    return col < w_real


def _prep_3x3_weights(w, cin_pad=None):
    """(3, 3, cin, cout) HWIO -> (3, cout, 3*cin) bf16, [dj+1][co, di*cin+c]."""
    if cin_pad:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, cin_pad - w.shape[2]), (0, 0)))
    w = jnp.transpose(w, (1, 3, 0, 2))  # (dj, cout, di, cin)
    return w.reshape(3, w.shape[1], -1).astype(jnp.bfloat16)


def _bn_vec(bn):
    scale, bias = bn
    return (scale.astype(jnp.float32)[:, None],
            bias.astype(jnp.float32)[:, None])


def fold_bn(gamma, beta, mean, var):
    """BN moving-stat affine (inference / frozen mode), as (scale, bias)."""
    scale = gamma * jax.lax.rsqrt(var + BN_EPS)
    return scale, beta - mean * scale


# ---------------------------------------------------------------------------
# fused stem: conv1 (3x3, s2d-folded cin->c1) + BN/leaky + conv2'
# (2x2 front-padded c1->c2) + BN/leaky — all in the s2d (H/2, W/2) domain
# ---------------------------------------------------------------------------


def _stem_kernel(x_hbm, w1, w2, s1, b1, s2, b2, out, x_s2, patches, sems,
                 *, wp, w_real, n_tiles):
    i = pl.program_id(0)
    j = pl.program_id(1)
    ht = HT
    tp = ht * wp
    interior = (j > 0) & (j < n_tiles - 1)

    def dma(jj, slot):
        # x rows [R0-2 .. R0+ht] (R0 = (jj-1)*ht) -> start (R0+PAD-2)*wp
        return pltpu.make_async_copy(
            x_hbm.at[i, :, pl.ds((jj - 1) * ht * wp + (PAD - 2) * wp,
                                 (ht + 3) * wp)],
            x_s2.at[slot], sems.at[slot],
        )

    @pl.when(j == 1)
    def _():
        dma(1, 1).start()

    @pl.when((j >= 1) & (j + 1 <= n_tiles - 2))
    def _():
        dma(j + 1, (j + 1) % 2).start()

    @pl.when(jnp.logical_not(interior))
    def _():
        out[0] = jnp.zeros_like(out[0])

    @pl.when(interior)
    def _():
        dma(j, j % 2).wait()
        xv = x_s2[j % 2]
        cin = xv.shape[0]
        pix1 = (ht + 1) * wp  # t1 rows [-1 .. ht-1]

        # conv1: all nine taps in one K = 9*cin matmul (cin is tiny)
        for dj in (-1, 0, 1):
            xr = _roll_cols(xv, dj)
            for di in range(3):
                k = (di * 3 + (dj + 1)) * cin
                patches[k:k + cin, :] = xr[:, di * wp:di * wp + pix1]
        t1 = _leaky(_mm(w1[...], patches[...]) * s1[...] + b1[...])
        t1 = jnp.where(_col_mask(pix1, wp, w_real), t1, 0.0)
        # conv2's front padding demands t1 row -1 == EXACT zero; computing
        # conv1 over the pad rows gives conv-of-zeros (= leaky(bias)) != 0.
        # Only the first interior tile owns image row -1.
        row_ok = (j > 1) | (
            jax.lax.broadcasted_iota(jnp.int32, (1, pix1), 1) >= wp
        )
        t1 = jnp.where(row_ok, t1, 0.0)
        t1 = t1.astype(jnp.bfloat16)

        # conv2': taps (a, b) in {0,1}^2 read t1[row r-1+a, col j-1+b]
        # (front padding (1,0)x(1,0)); t1 row r-1+a sits at slice offset
        # a*wp in the [-1 .. ht-1] extent.
        acc = None
        for a in (0, 1):
            sl = t1[:, a * wp:a * wp + tp]
            for b in (0, 1):
                term = _mm(w2[a * 2 + b], _roll_cols(sl, b - 1))
                acc = term if acc is None else acc + term
        y = _leaky(acc * s2[...] + b2[...])
        out[0] = jnp.where(_col_mask(tp, wp, w_real), y, 0.0).astype(
            jnp.bfloat16)


@functools.partial(
    jax.jit, static_argnames=("h", "w_real", "wp", "interpret")
)
def fused_stem_cf(x_flat, k3, k2, bn1, bn2, *, h, w_real, wp,
                  interpret=False):
    """Fused space-to-depth stem on the flat CF layout.

    Args:
      x_flat: (N, cin, (h+2*PAD)*wp) bf16 s2d input in chain convention
        (build with pack_nhwc_to_flat_cf; cin zero-padded to a multiple
        of 8 sublanes).
      k3: (3, 3, cin_s2d, c1) s2d-folded conv1 kernel
        (models.darknet._stem_kernels).
      k2: (2, 2, c1, c2) folded stride-2 conv2 kernel.
      bn1 / bn2: (scale, bias) folded BN affines ((c1,) — pre-tiled x4 —
        and (c2,)).

    Returns (N, c2, (h+2*PAD)*wp) bf16 in chain convention.
    """
    n, cin, _ = x_flat.shape
    c1, c2 = k3.shape[3], k2.shape[3]
    assert h % HT == 0 and wp % 128 == 0 and cin % 8 == 0
    # single-matmul conv1 weights: (c1, 9*cin), K index (di*3+dj)*cin + c
    w1 = jnp.pad(k3, ((0, 0), (0, 0), (0, cin - k3.shape[2]), (0, 0)))
    w1 = jnp.transpose(w1, (3, 0, 1, 2)).reshape(c1, 9 * cin).astype(
        jnp.bfloat16)
    w2 = jnp.transpose(k2, (0, 1, 3, 2)).reshape(4, c2, c1).astype(
        jnp.bfloat16)
    s1, b1 = _bn_vec(bn1)
    s2, b2 = _bn_vec(bn2)
    n_tiles = h // HT + 2
    return pl.pallas_call(
        functools.partial(_stem_kernel, wp=wp, w_real=w_real,
                          n_tiles=n_tiles),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c2, HT * wp), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c2, (h + 2 * PAD) * wp),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, cin, (HT + 3) * wp), jnp.bfloat16),
            pltpu.VMEM((9 * cin, (HT + 1) * wp), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x_flat, w1, w2, s1, b1, s2, b2)


# ---------------------------------------------------------------------------
# fused residual block: 1x1 reduce + BN/leaky + 3x3 expand + BN/leaky + add
# ---------------------------------------------------------------------------


def _store_phase_packed(out, y, s_pack, wp, ht):
    """Store bf16 y (C, ht*wp) with each row's columns reordered to
    [even half | odd half] via a one-hot MXU matmul (y_row @ S).  A lane
    deinterleave is a relayout Mosaic does poorly; the MXU does it at
    ~3 us/tile, and the stride-2 consumer then reads lane-ALIGNED
    halves."""
    for r in range(ht):
        packed = jax.lax.dot_general(
            y[:, r * wp:(r + 1) * wp], s_pack[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out[0, :, r * wp:(r + 1) * wp] = packed.astype(jnp.bfloat16)


def _res_kernel(x_hbm, wa, wb, sa, ba, sb, bb, s_pack, out, x_s2, patches,
                sems, *, wp, w_real, n_tiles, pack_phases):
    i = pl.program_id(0)
    j = pl.program_id(1)
    ht = HT
    tp = ht * wp
    interior = (j > 0) & (j < n_tiles - 1)

    # double-buffered input DMA: tile j's fetch was started during tile
    # j-1 (slot j % 2); this step starts j+1's fetch into the other slot
    # so the HBM read overlaps this tile's compute.
    def dma(jj, slot):
        return pltpu.make_async_copy(
            x_hbm.at[i, :, pl.ds((jj - 1) * ht * wp + (PAD - 1) * wp,
                                 (ht + 2) * wp)],
            x_s2.at[slot], sems.at[slot],
        )

    @pl.when(j == 1)
    def _():
        dma(1, 1).start()

    @pl.when((j >= 1) & (j + 1 <= n_tiles - 2))
    def _():
        dma(j + 1, (j + 1) % 2).start()

    @pl.when(jnp.logical_not(interior))
    def _():
        out[0] = jnp.zeros_like(out[0])

    @pl.when(interior)
    def _():
        dma(j, j % 2).wait()
        xv = x_s2[j % 2]
        pixh = (ht + 2) * wp
        # 1x1 reduce over the halo extent (the 3x3 needs t's halo rows)
        t = _leaky(_mm(wa[...], xv) * sa[...] + ba[...])
        t = jnp.where(_col_mask(pixh, wp, w_real), t, 0.0)
        # the 3x3's SAME padding demands t == EXACT zero on rows outside
        # the image (the 1x1 of a zero pad row is leaky(bias) != 0): row
        # -1 on the first interior tile, row h on the last.
        col = jax.lax.broadcasted_iota(jnp.int32, (1, pixh), 1)
        row_ok = ((j > 1) | (col >= wp)) & (
            (j < n_tiles - 2) | (col < pixh - wp)
        )
        t = jnp.where(row_ok, t, 0.0)
        t = t.astype(jnp.bfloat16)
        acc = _conv3x3_acc(wb, t, wp, tp, patches)
        y = _leaky(acc * sb[...] + bb[...])
        y = jnp.where(_col_mask(tp, wp, w_real), y, 0.0)
        y = (y + xv[:, wp:wp + tp].astype(jnp.float32)).astype(
            jnp.bfloat16)
        if pack_phases:
            _store_phase_packed(out, y, s_pack, wp, ht)
        else:
            out[0] = y


@functools.partial(
    jax.jit,
    static_argnames=("h", "w_real", "wp", "pack_phases", "interpret"),
)
def fused_res_block_cf(x_flat, wa, wb, bna, bnb, *, h, w_real, wp,
                       pack_phases=False, interpret=False):
    """One darknet residual block (1x1 C->C/2, 3x3 C/2->C, +x) fused.

    x_flat: (N, C, (h+2*PAD)*wp) bf16 chain convention.  wa: (1,1,C,C/2);
    wb: (3,3,C/2,C).  Returns the same shape/convention — unless
    ``pack_phases``, in which case every row's columns are reordered to
    [even half | odd half] for a stride-2 consumer
    (fused_downsample_packed_cf).
    """
    n, c, _ = x_flat.shape
    cmid = wa.shape[3]
    assert h % HT == 0 and c % 8 == 0 and cmid % 8 == 0
    wa2 = jnp.transpose(wa[0, 0], (1, 0)).astype(jnp.bfloat16)  # (C/2, C)
    wb2 = _prep_3x3_weights(wb)  # (3, C, 3*C/2)
    sa, ba = _bn_vec(bna)
    sb, bb = _bn_vec(bnb)
    # one-hot phase-pack matrix: col j<wp/2 <- row 2j (even), else row
    # 2(j-wp/2)+1 (odd)
    hw = wp // 2
    import numpy as _np

    s_np = _np.zeros((wp, wp), _np.float32)
    s_np[2 * _np.arange(hw), _np.arange(hw)] = 1.0
    s_np[2 * _np.arange(hw) + 1, hw + _np.arange(hw)] = 1.0
    s_pack = jnp.asarray(s_np, jnp.bfloat16)
    n_tiles = h // HT + 2
    return pl.pallas_call(
        functools.partial(_res_kernel, wp=wp, w_real=w_real,
                          n_tiles=n_tiles, pack_phases=pack_phases),
        grid=(n, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec((1, c, HT * wp), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c, (h + 2 * PAD) * wp),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, c, (HT + 2) * wp), jnp.bfloat16),
            pltpu.VMEM((3 * cmid, HT * wp), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x_flat, wa2, wb2, sa, ba, sb, bb, s_pack)


# ---------------------------------------------------------------------------
# stride-2 downsample conv (3x3, darknet (1,1)x(1,1) pad) + BN/leaky
# ---------------------------------------------------------------------------


def _down_kernel(xe_hbm, xo_hbm, w, s, b, out, xe_s, xo_s, patches, sems,
                 *, hw, w_real_out, n_tiles):
    # xe/xo: column-deinterleaved halves of the input, flat width hw =
    # wp_in // 2 == wp_out.  Output col J reads input cols 2J-1 (odd,
    # J-1), 2J (even, J), 2J+1 (odd, J); output row r reads input rows
    # 2r-1 .. 2r+1.
    i = pl.program_id(0)
    j = pl.program_id(1)
    ht = HT
    tp = ht * hw
    cin = xe_s.shape[0]
    interior = (j > 0) & (j < n_tiles - 1)

    @pl.when(jnp.logical_not(interior))
    def _():
        out[0] = jnp.zeros_like(out[0])

    @pl.when(interior)
    def _():
        # input rows [2*R0-1 .. 2*R0+2*ht] (R0 = (j-1)*ht), 2*ht+2 rows
        start = (2 * (j - 1) * ht + PAD - 1) * hw
        cpe = pltpu.make_async_copy(
            xe_hbm.at[i, :, pl.ds(start, (2 * ht + 2) * hw)], xe_s,
            sems.at[0])
        cpo = pltpu.make_async_copy(
            xo_hbm.at[i, :, pl.ds(start, (2 * ht + 2) * hw)], xo_s,
            sems.at[1])
        cpe.start()
        cpo.start()
        cpe.wait()
        cpo.wait()

        acc = None
        for bcol in (-1, 0, 1):
            if bcol == -1:
                arr = _roll_cols(xo_s[...], -1)
            elif bcol == 0:
                arr = xe_s[...]
            else:
                arr = xo_s[...]
            # out row r needs input tile rows 2r+di (di in 0..2, tile row
            # 0 == input row 2*R0-1): per-row strided copies into the
            # K-stacked patch matrix (all slices lane-aligned, hw % 128
            # == 0)
            for di in range(3):
                for r in range(ht):
                    patches[di * cin:(di + 1) * cin, r * hw:(r + 1) * hw] = (
                        arr[:, (2 * r + di) * hw:(2 * r + di + 1) * hw]
                    )
            term = _mm(w[bcol + 1], patches[...])
            acc = term if acc is None else acc + term
        y = _leaky(acc * s[...] + b[...])
        out[0] = jnp.where(_col_mask(tp, hw, w_real_out), y, 0.0).astype(
            jnp.bfloat16)


@functools.partial(
    jax.jit, static_argnames=("h_out", "w_real_out", "hw", "interpret")
)
def fused_downsample_cf(x_even, x_odd, w, bn, *, h_out, w_real_out, hw,
                        interpret=False):
    """Stride-2 3x3 conv (darknet (1,1)x(1,1) pad) + BN/leaky, CF flat.

    x_even / x_odd: (N, C, (2*h_out + 2*PAD) * hw) bf16 — the input's
    even / odd columns (build with split_cols_flat), chain convention.
    w: (3, 3, C, cout).  Returns (N, cout, (h_out+2*PAD)*hw).
    """
    n, c, _ = x_even.shape
    cout = w.shape[3]
    assert h_out % HT == 0 and hw % 128 == 0
    w2 = _prep_3x3_weights(w)  # (3, cout, 3C), K index di*C + c
    s, b = _bn_vec(bn)
    n_tiles = h_out // HT + 2
    return pl.pallas_call(
        functools.partial(_down_kernel, hw=hw, w_real_out=w_real_out,
                          n_tiles=n_tiles),
        grid=(n, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((1, cout, HT * hw), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, cout, (h_out + 2 * PAD) * hw),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((c, (2 * HT + 2) * hw), jnp.bfloat16),
            pltpu.VMEM((c, (2 * HT + 2) * hw), jnp.bfloat16),
            pltpu.VMEM((3 * c, HT * hw), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x_even, x_odd, w2, s, b)


def _down_packed_kernel(x_hbm, w, s, b, out, x_s2, xe_s, xo_s, patches,
                        sems, *, wp_in, w_real_out, n_tiles):
    # x: phase-packed rows [even half | odd half] (pack_phases producer).
    # Same tap logic as _down_kernel, but the halves come from lane-
    # aligned per-row slices of one DMA'd tile instead of two arrays.
    i = pl.program_id(0)
    j = pl.program_id(1)
    ht = HT
    hw = wp_in // 2
    tp = ht * hw
    cin = xe_s.shape[0]
    n_rows = 2 * ht + 2
    interior = (j > 0) & (j < n_tiles - 1)

    def dma(jj, slot):
        # input rows [2*R0-1 .. 2*R0+2*ht] (R0 = (jj-1)*ht)
        return pltpu.make_async_copy(
            x_hbm.at[i, :, pl.ds((2 * (jj - 1) * ht + PAD - 1) * wp_in,
                                 n_rows * wp_in)],
            x_s2.at[slot], sems.at[slot],
        )

    @pl.when(j == 1)
    def _():
        dma(1, 1).start()

    @pl.when((j >= 1) & (j + 1 <= n_tiles - 2))
    def _():
        dma(j + 1, (j + 1) % 2).start()

    @pl.when(jnp.logical_not(interior))
    def _():
        out[0] = jnp.zeros_like(out[0])

    @pl.when(interior)
    def _():
        dma(j, j % 2).wait()
        xv = x_s2[j % 2]
        for q in range(n_rows):
            xe_s[:, q * hw:(q + 1) * hw] = xv[:, q * wp_in:q * wp_in + hw]
            xo_s[:, q * hw:(q + 1) * hw] = xv[:, q * wp_in + hw:
                                              (q + 1) * wp_in]

        acc = None
        for bcol in (-1, 0, 1):
            if bcol == -1:
                arr = _roll_cols(xo_s[...], -1)
            elif bcol == 0:
                arr = xe_s[...]
            else:
                arr = xo_s[...]
            for di in range(3):
                for r in range(ht):
                    patches[di * cin:(di + 1) * cin,
                            r * hw:(r + 1) * hw] = (
                        arr[:, (2 * r + di) * hw:(2 * r + di + 1) * hw]
                    )
            term = _mm(w[bcol + 1], patches[...])
            acc = term if acc is None else acc + term
        y = _leaky(acc * s[...] + b[...])
        out[0] = jnp.where(_col_mask(tp, hw, w_real_out), y, 0.0).astype(
            jnp.bfloat16)


@functools.partial(
    jax.jit,
    static_argnames=("h_out", "w_real_out", "wp_in", "interpret"),
)
def fused_downsample_packed_cf(x_packed, w, bn, *, h_out, w_real_out,
                               wp_in, interpret=False):
    """Stride-2 3x3 conv + BN/leaky from a PHASE-PACKED input.

    x_packed: (N, C, (2*h_out+2*PAD)*wp_in) bf16 with each row's columns
    as [even half | odd half] (fused_res_block_cf(pack_phases=True)).
    Returns (N, 2C, (h_out+2*PAD)*(wp_in//2)) in standard chain
    convention.
    """
    n, c, _ = x_packed.shape
    cout = w.shape[3]
    hw = wp_in // 2
    assert h_out % HT == 0 and hw % 128 == 0
    w2 = _prep_3x3_weights(w)
    s, b = _bn_vec(bn)
    n_tiles = h_out // HT + 2
    n_rows = 2 * HT + 2
    return pl.pallas_call(
        functools.partial(_down_packed_kernel, wp_in=wp_in,
                          w_real_out=w_real_out, n_tiles=n_tiles),
        grid=(n, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((1, cout, HT * hw), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, cout, (h_out + 2 * PAD) * hw),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, c, n_rows * wp_in), jnp.bfloat16),
            pltpu.VMEM((c, n_rows * hw), jnp.bfloat16),
            pltpu.VMEM((c, n_rows * hw), jnp.bfloat16),
            pltpu.VMEM((3 * c, HT * hw), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x_packed, w2, s, b)


# ---------------------------------------------------------------------------
# XLA-side layout helpers
# ---------------------------------------------------------------------------


def pack_nhwc_to_flat_cf(x, wp, c_pad=None, dtype=jnp.bfloat16):
    """(N, H, W, C) -> (N, C[pad], (H+2*PAD)*wp), chain convention."""
    n, h, w, c = x.shape
    y = jnp.transpose(x, (0, 3, 1, 2)).astype(dtype)  # (N, C, H, W)
    y = jnp.pad(y, ((0, 0), (0, (c_pad or c) - c), (PAD, PAD),
                    (0, wp - w)))
    return y.reshape(n, (c_pad or c), (h + 2 * PAD) * wp)


def unpack_flat_cf_to_nhwc(x_flat, h, w_real, wp, dtype=jnp.bfloat16):
    """Chain-convention (N, C, (h+2*PAD)*wp) -> (N, h, w_real, C)."""
    n, c, _ = x_flat.shape
    y = x_flat.reshape(n, c, h + 2 * PAD, wp)[:, :, PAD:PAD + h, :w_real]
    return jnp.transpose(y, (0, 2, 3, 1)).astype(dtype)


def split_cols_flat(x_flat, wp):
    """Chain-convention (N, C, R*wp) -> even/odd column halves, each
    (N, C, R*(wp//2)), chain convention preserved."""
    n, c, total = x_flat.shape
    r = total // wp
    y = x_flat.reshape(n, c, r, wp // 2, 2)
    even = y[..., 0].reshape(n, c, r * (wp // 2))
    odd = y[..., 1].reshape(n, c, r * (wp // 2))
    return even, odd
