"""Darknet-53 backbone and the darknet53.conv.74 binary weight importer.

Topology parity with lib_yolo/darknet.py:7-39: conv32 then five downsample
stages (64, 128, 256, 512, 1024) with 1/2/8/8/4 residual blocks.  Skip
activations are surfaced at stride 8 (reference layer 36) and stride 16
(reference layer 61) for the FPN-style detection heads.

Instead of a stateful graph builder, the backbone is a static spec list of
52 convs; parameters are a flat dict keyed ``conv_00 .. conv_51`` in weight
file order, which makes the binary importer (parity: darknet.py:42-122) a
straight sequential read.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.common import (
    _bn_affine,
    conv2d,
    conv_block,
    init_conv_block,
    leaky_relu,
)

# (kernel_size, out_channels, stride); residual adds are implied by the
# stage structure below and applied in ``darknet53``.
_STAGES: Tuple[Tuple[int, int], ...] = ((64, 1), (128, 2), (256, 8), (512, 8), (1024, 4))


def _build_specs() -> List[Tuple[int, int, int]]:
    specs = [(3, 32, 1)]
    for cout, blocks in _STAGES:
        specs.append((3, cout, 2))
        for _ in range(blocks):
            specs.append((1, cout // 2, 1))
            specs.append((3, cout, 1))
    return specs


DARKNET53_CONV_SPECS: List[Tuple[int, int, int]] = _build_specs()
assert len(DARKNET53_CONV_SPECS) == 52

# conv indices whose (post-residual) activation feeds the det heads:
# after stage 3 (stride 8, reference layer 36) and stage 4 (stride 16,
# reference layer 61).
SKIP8_IDX = 25
SKIP16_IDX = 42

# ablation knob: run the fused chain's 256-stage extension (convs 9-25)
# when the geometry allows.  Flip to False to A/B against the XLA
# 256-stage in one process (bench drift swamps cross-process deltas).
EXTEND_256 = True


def _conv_name(i: int) -> str:
    return f"conv_{i:02d}"


def init_darknet53(rng) -> Tuple[Dict, Dict]:
    params, stats = {}, {}
    cin = 3
    keys = jax.random.split(rng, len(DARKNET53_CONV_SPECS))
    for i, (k, cout, _) in enumerate(DARKNET53_CONV_SPECS):
        p, s = init_conv_block(keys[i], k, cin, cout)
        params[_conv_name(i)] = p
        stats[_conv_name(i)] = s
        cin = cout
    return params, stats


def _space_to_depth(x):
    """(N, H, W, C) -> (N, H/2, W/2, 4C); channel index (pi*2+pj)*C + c."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def _stem_onehots():
    """Constant one-hot fold tensors (numpy, static).

    M3[di,dj,pi,pj,a,b,r,s] = 1 iff full-res tap (pi+di-1, pj+dj-1) lands in
    s2d block offset (a-1, b-1) at phase (r, s).  M2[di,dj,a,b,p,q] likewise
    for the stride-2 conv (block offsets {-1, 0} -> index a in {0, 1}).
    """
    m3 = np.zeros((3, 3, 2, 2, 3, 3, 2, 2), np.float32)
    for pi in range(2):
        for pj in range(2):
            for di in range(3):
                for dj in range(3):
                    ai, r = divmod(pi + di - 1, 2)
                    aj, s = divmod(pj + dj - 1, 2)
                    m3[di, dj, pi, pj, ai + 1, aj + 1, r, s] = 1.0
    fold = {0: (0, 1), 1: (1, 0), 2: (1, 1)}  # di -> (A+1, phase)
    m2 = np.zeros((3, 3, 2, 2, 2, 2), np.float32)
    for di in range(3):
        ai, p = fold[di]
        for dj in range(3):
            aj, q = fold[dj]
            m2[di, dj, ai, aj, p, q] = 1.0
    return m3, m2


_M3, _M2 = _stem_onehots()


def _stem_kernels(w1, w2):
    """Fold [conv1 3x3/s1 (cin->c1), conv2 3x3/s2 darknet-pad (c1->c2)] into
    space-to-depth-domain kernels.

    The reference's first conv (cin=3, cout=32 at full resolution) maps to
    ~5% of the 128-lane MXU.  In the 2x2 space-to-depth domain the same math
    is one 3x3 conv (12 -> 4*c1, output channel (pi*2+pj)*c1+co = the
    phase-packed full-res conv1 output) and one 2x2 front-padded conv
    (4*c1 -> c2, consuming exactly the rows/cols the darknet-padded
    stride-2 conv reads).  Kernel entries that would read outside the
    original 3x3 window stay zero, so results are bit-equal up to float
    reduction order.

    The fold is ONE tiny dense einsum per kernel against a constant one-hot
    tensor — scatters and gathers both lower to per-element loops on TPU
    (measured: a 45-op dynamic-update-slice build costs ~40 ms inside scan,
    an index-map gather ~370 ms; the einsum is noise).
    """
    cin, c1, c2 = w1.shape[2], w1.shape[3], w2.shape[3]
    # (a, b, r, s, c, pi, pj, o) -> (3, 3, 4*cin, 4*c1)
    k3 = jnp.einsum("ijpqabrs,ijco->abrscpqo", jnp.asarray(_M3, w1.dtype), w1)
    k3 = k3.reshape(3, 3, 4 * cin, 4 * c1)
    # (a, b, p, q, c, o) -> (2, 2, 4*c1, c2)
    k2 = jnp.einsum("ijabpq,ijco->abpqco", jnp.asarray(_M2, w2.dtype), w2)
    k2 = k2.reshape(2, 2, 4 * c1, c2)
    return k3, k2


def _fast_stem(params, stats, x, compute_dtype):
    """conv_00 + conv_01 evaluated in the space-to-depth domain.

    Inference/frozen-BN only (moving statistics; batch-stat mode would need
    per-phase reductions).  Returns the (N, H/2, W/2, c2) activation that
    the plain path's second conv block produces.
    """
    p0, s0 = params[_conv_name(0)], stats[_conv_name(0)]
    p1, s1 = params[_conv_name(1)], stats[_conv_name(1)]
    k3, k2 = _stem_kernels(
        p0["w"].astype(compute_dtype), p1["w"].astype(compute_dtype)
    )
    xs = _space_to_depth(x.astype(compute_dtype))
    y = conv2d(xs, k3, stride=1).astype(jnp.float32)
    scale, bias = _bn_affine(p0["gamma"], p0["beta"], s0["mean"], s0["var"])
    y = leaky_relu(y * jnp.tile(scale, 4) + jnp.tile(bias, 4))
    h = conv2d(y.astype(compute_dtype), k2, padding=((1, 0), (1, 0)))
    h = h.astype(jnp.float32)
    scale, bias = _bn_affine(p1["gamma"], p1["beta"], s1["mean"], s1["var"])
    return leaky_relu(h * scale + bias).astype(compute_dtype)


def _fused_early_stages(params, stats, x, compute_dtype, packed_hw=None):
    """Convs 0-8 (s2d stem, res64, stride-2 64->128, res128 x2) — and,
    when the geometry allows, the whole 256-stage (convs 9-25) — via the
    fused channels-first Pallas kernels (ops.pallas_conv).

    These high-resolution low-channel stages run at 8-18% MFU under XLA's
    per-tap conv lowering (BENCH_NOTES.md round-3 accounting); the fused
    kernels K-stack the taps on the MXU contracting dimension and keep
    every intermediate in VMEM.  The 256-stage extension is a measured
    win too: at the ECP batch-11 shape (11x128x240x256) the fused res
    block runs 2.67 ms vs XLA's 3.65 (83 vs 61 TF/s, round-4 probe) —
    XLA only overtakes at 512 channels, where the chain hands over.
    Inference / frozen-BN only (moving statistics), bf16 activations.

    Returns ``(h, next_conv_index, skip8)``: without the extension
    ``h`` is the (N, H/4, W/4, 128) activation feeding the 256-stage and
    ``skip8`` is None; with it, ``h`` IS the stride-8 skip activation
    (N, H/8, W/8, 256) == ``skip8`` and next_conv_index is 26.

    ``packed_hw=(H, W)``: ``x`` is already the s2d channels-first uint8
    planes (N, 16, (H/2+2*PAD)*wp) from the HOST loader
    (data.pipeline.pack_planes_host) — the measured-irreducible ~4 ms
    on-device input relayout (BENCH_NOTES.md) is skipped; the device
    only casts u8 -> bf16 and scales by 1/255 on the already-CF layout.
    """
    from ..ops import pallas_conv as pc

    interpret = jax.default_backend() != "tpu"
    if packed_hw is not None:
        H, W = packed_hw
    else:
        n, H, W, _ = x.shape
    h2, w2 = H // 2, W // 2
    wp = -(-w2 // 256) * 256  # lane pad; wp/2 must stay a lane multiple
    assert w2 < wp, (
        f"W/2 == {w2} is a multiple of 256: the fused chain needs dead "
        "lanes right of the image to absorb its circular 3x3 column "
        "shifts (see _fused_early_ok) — this geometry must use the XLA "
        "path (or a padded host pack)"
    )

    p0, s0 = params[_conv_name(0)], stats[_conv_name(0)]
    p1, s1 = params[_conv_name(1)], stats[_conv_name(1)]
    k3, k2 = _stem_kernels(
        p0["w"].astype(jnp.bfloat16), p1["w"].astype(jnp.bfloat16)
    )
    bn1 = pc.fold_bn(
        jnp.tile(p0["gamma"], 4), jnp.tile(p0["beta"], 4),
        jnp.tile(s0["mean"], 4), jnp.tile(s0["var"], 4),
    )

    def bn_of(i):
        p, s = params[_conv_name(i)], stats[_conv_name(i)]
        return pc.fold_bn(p["gamma"], p["beta"], s["mean"], s["var"])

    if packed_hw is not None:
        assert x.ndim == 3 and x.shape[1] == 16, x.shape
        xf = x.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / 255.0)
    else:
        xf = pc.pack_nhwc_to_flat_cf(_space_to_depth(x), wp, c_pad=16)
    h = pc.fused_stem_cf(
        xf, k3, k2, bn1, bn_of(1), h=h2, w_real=w2, wp=wp,
        interpret=interpret,
    )
    h = pc.fused_res_block_cf(
        h, params[_conv_name(2)]["w"], params[_conv_name(3)]["w"],
        bn_of(2), bn_of(3), h=h2, w_real=w2, wp=wp, interpret=interpret,
        pack_phases=True,  # stride-2 consumer reads lane-aligned halves
    )
    h4, w4, hw = h2 // 2, w2 // 2, wp // 2
    h = pc.fused_downsample_packed_cf(
        h, params[_conv_name(4)]["w"], bn_of(4),
        h_out=h4, w_real_out=w4, wp_in=wp, interpret=interpret,
    )
    h = pc.fused_res_block_cf(
        h, params[_conv_name(5)]["w"], params[_conv_name(6)]["w"],
        bn_of(5), bn_of(6), h=h4, w_real=w4, wp=hw, interpret=interpret,
    )
    # 256-stage extension gate: the packed downsample halves the lane
    # pitch (needs hw % 256 == 0 so stage-256 rows stay 128-lane aligned)
    # and the row tiling needs H/8 % HT == 0.  EXTEND_256 is a
    # module-level ablation knob for same-process A/B benches.
    extend_256 = (EXTEND_256 and hw % 256 == 0
                  and h4 % (2 * pc.HT) == 0)
    h = pc.fused_res_block_cf(
        h, params[_conv_name(7)]["w"], params[_conv_name(8)]["w"],
        bn_of(7), bn_of(8), h=h4, w_real=w4, wp=hw, interpret=interpret,
        pack_phases=extend_256,
    )
    if not extend_256:
        return (pc.unpack_flat_cf_to_nhwc(h, h4, w4, hw,
                                          dtype=compute_dtype), 9, None)
    h8, w8, hw2 = h4 // 2, w4 // 2, hw // 2
    h = pc.fused_downsample_packed_cf(
        h, params[_conv_name(9)]["w"], bn_of(9),
        h_out=h8, w_real_out=w8, wp_in=hw, interpret=interpret,
    )
    for b in range(8):  # convs 10-25: the eight 256-stage res blocks
        i0 = 10 + 2 * b
        h = pc.fused_res_block_cf(
            h, params[_conv_name(i0)]["w"], params[_conv_name(i0 + 1)]["w"],
            bn_of(i0), bn_of(i0 + 1), h=h8, w_real=w8, wp=hw2,
            interpret=interpret,
        )
    skip8 = pc.unpack_flat_cf_to_nhwc(h, h8, w8, hw2, dtype=compute_dtype)
    return skip8, 26, skip8


def _fused_early_ok(x, training, compute_dtype):
    """Auto-gate for the fused early stages: inference/frozen BN, bf16,
    geometry tiles cleanly, and a real TPU backend (the interpret-mode
    kernels are for tests; CPU inference keeps the XLA path)."""
    from ..ops.pallas_conv import HT

    H, W = x.shape[1], x.shape[2]
    return (
        not training
        and compute_dtype == jnp.bfloat16
        and H % (4 * HT) == 0
        # the kernels' 3x3 column shifts are circular rotates absorbed by
        # the dead (masked-zero) lanes right of w_real; W/2 % 256 == 0
        # means NO dead lanes (w_real == wp) and the rotate would wrap
        # the neighboring row's edge pixel into the conv — keep XLA there
        and (W // 2) % 256 != 0
        and jax.default_backend() == "tpu"
    )


def darknet53(
    params: Dict,
    stats: Dict,
    x,
    *,
    training: bool = False,
    compute_dtype=jnp.float32,
    fast_stem: bool = True,
    fused_early=None,
    packed_hw=None,
):
    """Run the backbone.  Returns (out_s32, skip_s16, skip_s8, new_stats).

    ``training`` here is the *backbone* BN mode: False when the backbone is
    frozen (the default training config, reference yolov3.py:240-243), in
    which case BN uses moving statistics and stats pass through unchanged.

    ``fast_stem`` (inference/frozen mode only): the first two convs run in
    the 2x2 space-to-depth domain (see ``_stem_kernels``) — numerically the
    same function, ~10x cheaper on the MXU.  Batch-stat BN (``training``)
    falls back to the plain path.

    ``fused_early`` (None = auto on TPU): the whole early backbone
    (convs 0-8) runs as fused Pallas kernels (``_fused_early_stages``) —
    bf16 inference only; numerically equivalent up to bf16 reduction
    order.  Pass False under GSPMD spatial sharding (the kernels cannot
    be auto-partitioned; shard_map paths are fine — per-device shapes).

    ``packed_hw=(H, W)``: ``x`` is HOST-packed s2d channels-first uint8
    planes (data.pipeline.pack_planes_host) instead of an NHWC image;
    implies the fused-early path (inference, bf16).
    """
    new_stats = {}

    def block(i, h, stride):
        name = _conv_name(i)
        y, s = conv_block(
            params[name], stats[name], h, stride=stride,
            training=training, compute_dtype=compute_dtype,
        )
        new_stats[name] = s
        return y

    if packed_hw is not None:
        assert not training, "packed input is inference-only"
        fused_early = True
    elif fused_early is None:
        fused_early = _fused_early_ok(x, training, compute_dtype)
    skip8 = skip16 = None
    if fused_early:
        h, i, skip8 = _fused_early_stages(params, stats, x, compute_dtype,
                                          packed_hw=packed_hw)
        for k in range(i):
            new_stats[_conv_name(k)] = stats[_conv_name(k)]
        # resume the XLA stages after wherever the fused chain stopped
        # (9 -> before the 256-stage; 26 -> before the 512-stage, with
        # skip8 already emitted by the chain)
        remaining = list(_STAGES)[2 if i == 9 else 3:]
    elif fast_stem and not training:
        h = _fast_stem(params, stats, x, compute_dtype)
        new_stats[_conv_name(0)] = stats[_conv_name(0)]
        new_stats[_conv_name(1)] = stats[_conv_name(1)]
        i = 2
        stages = list(_STAGES)
        # stage 0's downsample is folded into the stem; run its residuals
        for _ in range(stages[0][1]):
            shortcut = h
            h = block(i, h, 1)
            i += 1
            h = block(i, h, 1)
            i += 1
            h = h + shortcut
        remaining = stages[1:]
    else:
        h = block(0, x, 1)
        i = 1
        remaining = list(_STAGES)
    for cout, blocks in remaining:
        h = block(i, h, 2)
        i += 1
        for _ in range(blocks):
            shortcut = h
            h = block(i, h, 1)
            i += 1
            h = block(i, h, 1)
            i += 1
            h = h + shortcut  # residual (layers.py:505-507)
        if i - 1 == SKIP8_IDX:
            skip8 = h
        elif i - 1 == SKIP16_IDX:
            skip16 = h
    assert skip8 is not None and skip16 is not None
    return h, skip16, skip8, new_stats


def load_darknet53_weights(
    weightfile: str, params: Dict, stats: Dict
) -> Tuple[Dict, Dict]:
    """Import the original darknet53.conv.74 binary into our pytrees.

    Binary format parity with lib_yolo/darknet.py:42-122: a 5-int32 header,
    then per conv [beta, gamma, moving_mean, moving_variance] followed by
    the kernel as (n, c, h, w) float32, transposed here to (h, w, c, n).
    Asserts the file is fully consumed (darknet.py:66).
    """
    with open(weightfile, "rb") as f:
        header = np.fromfile(f, dtype=np.int32, count=5)
        blob = np.fromfile(f, dtype=np.float32)
    del header

    params = dict(params)
    stats = dict(stats)
    ptr = 0
    for i, (k, cout, _) in enumerate(DARKNET53_CONV_SPECS):
        name = _conv_name(i)
        w = params[name]["w"]
        kh, kw, cin, n = w.shape
        assert kh == k and n == cout

        def take(cnt):
            nonlocal ptr
            out = blob[ptr : ptr + cnt]
            ptr += cnt
            return out

        beta = take(cout)
        gamma = take(cout)
        mean = take(cout)
        var = take(cout)
        kernel = take(kh * kw * cin * n).reshape(n, cin, kh, kw).transpose(2, 3, 1, 0)

        params[name] = {
            "w": jnp.asarray(kernel),
            "gamma": jnp.asarray(gamma),
            "beta": jnp.asarray(beta),
        }
        stats[name] = {"mean": jnp.asarray(mean), "var": jnp.asarray(var)}

    assert ptr == len(blob), f"weight file not fully consumed: {ptr} != {len(blob)}"
    return params, stats


def export_darknet53_weights(params: Dict, stats: Dict) -> bytes:
    """Inverse of ``load_darknet53_weights`` (used by round-trip tests)."""
    chunks = [np.zeros(5, dtype=np.int32).tobytes()]
    for i in range(len(DARKNET53_CONV_SPECS)):
        name = _conv_name(i)
        p, s = params[name], stats[name]
        for arr in (p["beta"], p["gamma"], s["mean"], s["var"]):
            chunks.append(np.asarray(arr, dtype=np.float32).tobytes())
        w = np.asarray(p["w"], dtype=np.float32).transpose(3, 2, 0, 1)  # -> (n,c,h,w)
        chunks.append(w.tobytes())
    return b"".join(chunks)
