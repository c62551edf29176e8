"""Fused-kernel driver for the MC-dropout head section (bayesian variant).

Runs everything after the backbone — 3 detection heads + scale transitions
(reference lib_yolo/yolov3.py:543-622) — through the fused Pallas kernels of
ops/pallas_heads.py on the flat channels-first layout, eliminating the
~8.7 ms/img of XLA mask-materialization traffic (see that module's
docstring).  The mask draws are bit-identical to models.yolov3._heads: the
per-(sample, site) u32 keys are derived by the exact split sequence the XLA
path uses, and the in-kernel hash is ops.common.hash_keep.

Kernel assignment per stage (arithmetic intensity / VMEM budget, details in
ops/pallas_heads.py):

* head 1 (512/1024 ch): single-conv kernels — 1x1s are compute-bound even
  standalone; the (3,1024,1536) 3x3 weights leave no VMEM room for pairs.
  The detection conv fuses into conv5's kernel.
* heads 2/3 (128-512 ch): fused (1x1 + 3x3) pair kernels; the skip concat
  becomes a split matmul (x2 input), the detection conv and the scale
  branch ride the last pair.
* transitions: the 1x1 kernel (no dropout); 2x nearest upsample is an XLA
  reshape/broadcast on the flat layout (zero pads and dead columns are
  preserved by construction).

The public entry ``mc_heads_pallas_cf`` has the same output contract as
``models.yolov3.mc_forward_cf`` restricted to image batch NB == 1:
``[(raw_cf (ch, T, h*w) f32, (h, w)), ...]``.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..ops.pallas_conv import PAD, fold_bn, pack_nhwc_to_flat_cf
from ..ops.pallas_heads import (
    fused_conv1x1_cf,
    fused_conv3x3_cf,
    fused_head_pair_cf,
    fused_trans_upsample_cf,
    layout_fence,
)


def site_keys_u32(rng, T: int):
    """(T, 15) u32 dropout site keys — EXACT derivation parity with the XLA
    path: mc_forward_cf splits rng into T sample keys (yolov3.py:264), each
    sample splits into 15 site keys (yolov3.py:102), and ops.common.dropout
    draws one u32 scalar per site (common.py:dropout).

    The per-site draws are deliberately UNROLLED (not an inner vmap): the
    XLA path's 15 ``random.bits`` calls are each a scalar draw under the
    T-sample vmap, and non-threefry PRNG impls (rbg — the production
    default, bench.py) are vmap-batching-sensitive: an inner vmap over
    sites yields DIFFERENT u32s than 15 scalar calls, silently breaking
    mask parity with the XLA path (measured; threefry is invariant).
    """
    tkeys = jax.random.split(rng, T)

    def per_sample(k):
        sk = jax.random.split(k, 15)
        return jnp.stack(
            [jax.random.bits(sk[s], (), jnp.uint32) for s in range(15)])

    return jax.vmap(per_sample)(tkeys)


def _bkeys(keys_u32, s0: int, s1: int | None):
    """Select sites (s0, s1) -> the kernels' (T, 2, 128) broadcast layout."""
    t = keys_u32.shape[0]
    second = keys_u32[:, s1] if s1 is not None else jnp.zeros_like(
        keys_u32[:, s0])
    pair = jnp.stack([keys_u32[:, s0], second], axis=1)
    return jnp.broadcast_to(pair[:, :, None], (t, 2, 128)).astype(jnp.uint32)


def wp_of(w: int) -> int:
    """Row pitch: smallest power of two STRICTLY greater than w (the dead
    columns double as the 3x3's zero padding under lane rolls)."""
    wp = 64
    while wp <= w:
        wp *= 2
    return wp


def heads_pallas_ok(img_batch: int, h1: int, platform_ok: bool) -> bool:
    """Auto-gate: TPU bf16 inference, image batch 1, rows tile cleanly."""
    return platform_ok and img_batch == 1 and h1 % 8 == 0


def _pick_st(T: int, *, c1: int, c2: int, cmid: int, cb: int, chp: int,
             wp: int, ht: int, det: bool, branch: bool,
             budget: int = 12 * 2 ** 20, cap: int = 8) -> int:
    """Largest samples-per-step ``st`` (divisor of T, <= cap) whose pair-
    kernel VMEM footprint — double-buffered (st, c1, halo) input scratch,
    shared-x2 + hoisted-product scratch, patches, 3x3 weights, and the
    (2*st)-buffered output blocks — fits the scoped budget (16 MB limit
    minus slack for Mosaic temporaries)."""
    halo = (ht + 4) * wp
    tp = ht * wp
    best = 1
    for st in range(1, min(T, cap) + 1):
        if T % st:
            continue
        b = 2 * st * c1 * halo * 2
        b += c2 * halo * 2 + cmid * halo * 4     # x2 + hoisted 1x1 product
        b += (3 * cmid * tp * 2) if wp % 128 == 0 else 0
        b += 9 * cmid * cb * 2
        if det:
            b += 2 * chp * st * tp * 4
            if branch:
                b += 2 * st * cmid * tp * 2
        else:
            b += 2 * st * cb * tp * 2
        if b <= budget:
            best = st
    return best


def upsample2x_flat_cf(x, h: int, wp: int):
    """2x nearest upsample on the flat CF chain layout.

    (T, c, (h+2*PAD)*wp) -> (T, c, (2h+2*PAD)*(2*wp)).  Zero pad rows are
    rebuilt; zeroed dead columns (>= w) map onto the output's dead columns
    (>= 2w), so the chain invariant is preserved with no masking pass.
    """
    t, c, _ = x.shape
    y = x.reshape(t, c, h + 2 * PAD, wp)[:, :, PAD:PAD + h, :]
    y = jnp.broadcast_to(y[:, :, :, None, :, None], (t, c, h, 2, wp, 2))
    y = y.reshape(t, c, 2 * h, 2 * wp)
    y = jnp.pad(y, ((0, 0), (0, 0), (PAD, PAD), (0, 0)))
    return y.reshape(t, c, (2 * h + 2 * PAD) * 2 * wp)


def _det_to_raw_cf(det, ch: int, h: int, w: int, wp: int):
    """Kernel det output (ch_pad, T*(h+2*PAD)*wp) f32 -> (ch, T, h*w).

    The kernels emit detections channel-major / sample-major pixel planes,
    so the decoder view is a pad-stripping SLICE — no transpose pass."""
    chp, tl = det.shape
    t = tl // ((h + 2 * PAD) * wp)
    d = det.reshape(chp, t, h + 2 * PAD, wp)[:ch, :, PAD:PAD + h, :w]
    return d.reshape(ch, t, h * w)


def mc_heads_pallas_cf(
    params: Dict,
    stats: Dict,
    dn_out,
    skip16,
    skip8,
    *,
    T: int,
    rng,
    head_ch: int,
    interpret: bool = False,
):
    """T-sample MC-dropout head section via fused Pallas kernels (NB == 1).

    dn_out/skip16/skip8: NHWC backbone activations (batch 1).  Returns
    ``[(raw_cf (ch, T, h*w) f32, (h, w)), ...]`` — the mc_forward_cf
    contract.
    """
    assert dn_out.shape[0] == 1, "pallas head path is image-batch-1"
    # layout firewall: without it XLA's layout assignment propagates the
    # packs' transposes back into the backbone's convolutions and the
    # whole backbone slows ~3x (measured ~+15 ms/img; see
    # ops.pallas_heads.layout_fence)
    interp = interpret
    dn_out = layout_fence(dn_out, interpret=interp)
    skip16 = layout_fence(skip16, interpret=interp)
    skip8 = layout_fence(skip8, interpret=interp)
    h1, w1 = dn_out.shape[1:3]
    geoms = {1: (h1, w1, wp_of(w1)),
             2: (2 * h1, 2 * w1, 2 * wp_of(w1)),
             3: (4 * h1, 4 * w1, 4 * wp_of(w1))}
    keys = site_keys_u32(rng, T)
    zkeys = jnp.zeros((T, 2, 128), jnp.uint32)

    def bn_of(name):
        p, s = params[name], stats[name]
        return fold_bn(p["gamma"], p["beta"], s["mean"], s["var"])

    # ---- head 1: single-conv kernels ------------------------------------
    h, w, wp = geoms[1]
    x = pack_nhwc_to_flat_cf(dn_out, wp)  # (1, 1024, L1), shared across T
    kw = dict(h=h, w_real=w, wp=wp, interpret=interpret)
    x = fused_conv1x1_cf(x, params["head1_conv0"]["w"], bn_of("head1_conv0"),
                         _bkeys(keys, 0, None), **kw)
    x = fused_conv3x3_cf(x, params["head1_conv1"]["w"], bn_of("head1_conv1"),
                         _bkeys(keys, 1, None), ht=4, **kw)
    x = fused_conv1x1_cf(x, params["head1_conv2"]["w"], bn_of("head1_conv2"),
                         _bkeys(keys, 2, None), **kw)
    x = fused_conv3x3_cf(x, params["head1_conv3"]["w"], bn_of("head1_conv3"),
                         _bkeys(keys, 3, None), ht=4, **kw)
    br1 = fused_conv1x1_cf(x, params["head1_conv4"]["w"],
                           bn_of("head1_conv4"), _bkeys(keys, 4, None), **kw)
    det1 = fused_conv3x3_cf(br1, params["head1_conv5"]["w"],
                            bn_of("head1_conv5"), zkeys, ht=4, drop=False,
                            det_w=params["det1"]["w"],
                            det_b=params["det1"]["b"], det_ch=head_ch, **kw)
    out = [(_det_to_raw_cf(det1, head_ch, h, w, wp), (h, w))]

    # ---- heads 2/3: transition + pair kernels ----------------------------
    branch = br1
    for head, skip in ((2, skip16), (3, skip8)):
        ph, pw, pwp = geoms[head - 1]
        up = fused_trans_upsample_cf(
            branch, params[f"trans{head - 1}"]["w"],
            bn_of(f"trans{head - 1}"), h=ph, w_real=pw, wp=pwp,
            interpret=interpret)
        h, w, wp = geoms[head]
        skip_cf = pack_nhwc_to_flat_cf(skip, wp)
        s0 = 5 * (head - 1)
        kw = dict(h=h, w_real=w, wp=wp, interpret=interpret)
        # sample-blocking: these small-channel stages are grid-step-
        # overhead-bound (see fused_head_pair_cf); each call gets the
        # largest st its VMEM footprint allows.  pair01 carries the extra
        # skip buffer + hoisted-product scratch, so it runs at ht=4 (at
        # ht=8 the 512-ch head-2 instance exceeded scoped VMEM and Mosaic
        # degraded pipelining to fit — measured 2.5x slower).
        c1u = up.shape[1]
        cmid = params[f"head{head}_conv0"]["w"].shape[3]
        cb = params[f"head{head}_conv1"]["w"].shape[3]
        chp = -(-head_ch // 8) * 8
        skc = skip_cf.shape[1]
        stk = dict(cmid=cmid, cb=cb, chp=chp, wp=wp)
        st01 = _pick_st(T, c1=c1u, c2=skc, ht=4, det=False, branch=False,
                        **stk)
        st23 = _pick_st(T, c1=cb, c2=0, ht=4, det=False, branch=False,
                        **stk)
        st45 = _pick_st(T, c1=cb, c2=0, ht=4, det=True, branch=head == 2,
                        **stk)
        y = fused_head_pair_cf(
            up, skip_cf, params[f"head{head}_conv0"]["w"],
            bn_of(f"head{head}_conv0"), params[f"head{head}_conv1"]["w"],
            bn_of(f"head{head}_conv1"), _bkeys(keys, s0, s0 + 1), ht=4,
            st=st01, **kw)
        y = fused_head_pair_cf(
            y, None, params[f"head{head}_conv2"]["w"],
            bn_of(f"head{head}_conv2"), params[f"head{head}_conv3"]["w"],
            bn_of(f"head{head}_conv3"), _bkeys(keys, s0 + 2, s0 + 3),
            ht=4, st=st23, **kw)
        res = fused_head_pair_cf(
            y, None, params[f"head{head}_conv4"]["w"],
            bn_of(f"head{head}_conv4"), params[f"head{head}_conv5"]["w"],
            bn_of(f"head{head}_conv5"), _bkeys(keys, s0 + 4, None),
            drop_b=False, det_w=params[f"det{head}"]["w"],
            det_b=params[f"det{head}"]["b"], det_ch=head_ch,
            branch=head == 2, ht=4, st=st45, **kw)
        if head == 2:
            det, branch = res
        else:
            det = res
        out.append((_det_to_raw_cf(det, head_ch, h, w, wp), (h, w)))
    return out
