"""Fused MC-dropout head kernels vs the XLA path.

The kernels draw BIT-IDENTICAL dropout masks to ops.common.dropout (same
lowbias32 hash, ops.common.hash_keep, same per-(sample, site) keys), so a
kernel and its conv_block composition must agree everywhere to bf16
reduction-order noise — a mask mismatch at any position would show up as a
0 vs value/0.9 blowup, which the tolerance cannot absorb.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bayesian_yolov3_tpu.models import heads_pallas as hp
from bayesian_yolov3_tpu.models.yolov3 import init_yolov3, mc_forward_cf
from bayesian_yolov3_tpu.core.blueprint import Variant, VariantSpec
from bayesian_yolov3_tpu.ops import pallas_conv as pc
from bayesian_yolov3_tpu.ops import pallas_heads as ph
from bayesian_yolov3_tpu.ops.common import (
    BN_EPS,
    conv_block,
    detection_conv,
    dropout,
    init_conv_block,
    init_detection_conv,
)

BF = jnp.bfloat16
TOL = dict(rtol=0.06, atol=0.06)


def _params(seed, k, cin, cout):
    p, s = init_conv_block(jax.random.PRNGKey(seed), k, cin, cout)
    r = np.random.default_rng(seed)
    s = {"mean": jnp.asarray(r.normal(0, 0.3, cout), jnp.float32),
         "var": jnp.asarray(r.uniform(0.5, 2.0, cout), jnp.float32)}
    p = dict(p, gamma=jnp.asarray(r.uniform(0.5, 1.5, cout), jnp.float32),
             beta=jnp.asarray(r.normal(0, 0.2, cout), jnp.float32))
    return p, s


def _bn(p, s):
    return pc.fold_bn(p["gamma"], p["beta"], s["mean"], s["var"])


def _keys(site_rngs):
    """(T, 2, 128) kernel key layout from per-(sample, site) rngs."""
    u = jnp.stack([
        jnp.stack([jax.random.bits(k, (), jnp.uint32) for k in row])
        for row in site_rngs])
    return jnp.broadcast_to(u[:, :, None], (u.shape[0], 2, 128))


def test_conv1x1_masked_matches_conv_block():
    h, w, wp, cin, cout, T = 16, 30, 64, 32, 48, 2
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(0, 1, (T, h, w, cin)), BF)
    p, s = _params(1, 1, cin, cout)
    rngs = [[jax.random.PRNGKey(100 + t), jax.random.PRNGKey(0)]
            for t in range(T)]

    xf = pc.pack_nhwc_to_flat_cf(x, wp)
    got = ph.fused_conv1x1_cf(xf, p["w"], _bn(p, s), _keys(rngs),
                              h=h, w_real=w, wp=wp, interpret=True)
    got = pc.unpack_flat_cf_to_nhwc(got, h, w, wp)
    for t in range(T):
        want, _ = conv_block(p, s, x[t:t + 1], drop_rate=0.1,
                             rng=rngs[t][0], compute_dtype=BF)
        np.testing.assert_allclose(np.asarray(got[t:t + 1], np.float32),
                                   np.asarray(want, np.float32), **TOL)


def test_conv1x1_mask_bits_exact():
    # scale == 1, bias == 0: dropped positions are EXACTLY zero in both
    # paths; positive activations make kept positions strictly positive.
    h, w, wp, cin, cout = 8, 20, 64, 16, 16
    r = np.random.default_rng(2)
    x = jnp.asarray(r.uniform(0.5, 1.0, (1, h, w, cin)), BF)
    p, _ = init_conv_block(jax.random.PRNGKey(3), 1, cin, cout)
    p = dict(p, w=jnp.abs(p["w"]) + 0.05)
    s = {"mean": jnp.zeros(cout), "var": jnp.ones(cout) - BN_EPS}
    rng = jax.random.PRNGKey(7)

    xf = pc.pack_nhwc_to_flat_cf(x, wp)
    got = ph.fused_conv1x1_cf(xf, p["w"], _bn(p, s),
                              _keys([[rng, rng]]),
                              h=h, w_real=w, wp=wp, interpret=True)
    got = np.asarray(pc.unpack_flat_cf_to_nhwc(got, h, w, wp), np.float32)

    y = jnp.ones((1, h, w, cout), BF)
    ref_mask = np.asarray(dropout(y, 0.1, rng), np.float32) > 0
    assert ref_mask.mean() < 1.0  # some positions actually dropped
    np.testing.assert_array_equal(got[0] > 0, ref_mask[0])


def test_conv3x3_masked_matches_conv_block():
    # w = 30 < wp = 64 exercises the unaligned-offset roll path; the
    # shared-input mode (Tx == 1) must give each sample its own mask.
    h, w, wp, cin, cout, T = 16, 30, 64, 32, 64, 2
    r = np.random.default_rng(4)
    x = jnp.asarray(r.normal(0, 1, (1, h, w, cin)), BF)
    p, s = _params(5, 3, cin, cout)
    rngs = [[jax.random.PRNGKey(200 + t), jax.random.PRNGKey(0)]
            for t in range(T)]

    xf = pc.pack_nhwc_to_flat_cf(x, wp)
    got = ph.fused_conv3x3_cf(xf, p["w"], _bn(p, s), _keys(rngs),
                              h=h, w_real=w, wp=wp, ht=4, interpret=True)
    got = pc.unpack_flat_cf_to_nhwc(got, h, w, wp)
    outs = []
    for t in range(T):
        want, _ = conv_block(p, s, x, drop_rate=0.1, rng=rngs[t][0],
                             compute_dtype=BF)
        np.testing.assert_allclose(np.asarray(got[t:t + 1], np.float32),
                                   np.asarray(want, np.float32), **TOL)
        outs.append(np.asarray(want))
    assert (outs[0] != outs[1]).any()  # distinct per-sample masks


def test_conv3x3_fused_det_matches_xla():
    h, w, wp, cin, cout, ch = 16, 60, 64, 32, 48, 10
    r = np.random.default_rng(6)
    x = jnp.asarray(r.normal(0, 1, (1, h, w, cin)), BF)
    p, s = _params(7, 3, cin, cout)
    det = init_detection_conv(jax.random.PRNGKey(8), cout, ch)
    det = dict(det, b=jnp.asarray(r.normal(0, 0.5, ch), jnp.float32))

    want, _ = conv_block(p, s, x, compute_dtype=BF)
    want = detection_conv(det, want, compute_dtype=BF)

    xf = pc.pack_nhwc_to_flat_cf(x, wp)
    got = ph.fused_conv3x3_cf(
        xf, p["w"], _bn(p, s), jnp.zeros((1, 2, 128), jnp.uint32),
        h=h, w_real=w, wp=wp, ht=8, drop=False,
        det_w=det["w"], det_b=det["b"], det_ch=ch, interpret=True)
    # det layout: (ch_pad, T*L), sample-major pixel planes
    assert got.shape == (16, (h + 2 * pc.PAD) * wp)
    got = got.reshape(16, 1, h + 2 * pc.PAD, wp)[:ch, :,
                                                 pc.PAD:pc.PAD + h, :w]
    got = jnp.transpose(got, (1, 2, 3, 0))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), **TOL)


@pytest.mark.parametrize("st", [1, 2])
def test_head_pair_matches_conv_blocks(st):
    # skip-concat split matmul + two mask sites + fused det + branch;
    # st=2 exercises the sample-blocked grid (2 samples per step)
    h, w, wp, c1, c2, cmid, cb, ch, T = 16, 30, 64, 32, 48, 32, 64, 9, 4
    r = np.random.default_rng(9)
    x1 = jnp.asarray(r.normal(0, 1, (T, h, w, c1)), BF)
    x2 = jnp.asarray(r.normal(0, 1, (1, h, w, c2)), BF)
    pa, sa = _params(10, 1, c1 + c2, cmid)
    pb, sb = _params(11, 3, cmid, cb)
    det = init_detection_conv(jax.random.PRNGKey(12), cb, ch)
    rngs = [[jax.random.PRNGKey(300 + t), jax.random.PRNGKey(400 + t)]
            for t in range(T)]

    x1f = pc.pack_nhwc_to_flat_cf(x1, wp)
    x2f = pc.pack_nhwc_to_flat_cf(x2, wp)
    got_det, got_br = ph.fused_head_pair_cf(
        x1f, x2f, pa["w"], _bn(pa, sa), pb["w"], _bn(pb, sb), _keys(rngs),
        h=h, w_real=w, wp=wp, st=st, det_w=det["w"], det_b=det["b"],
        det_ch=ch, branch=True, interpret=True)
    got_br = pc.unpack_flat_cf_to_nhwc(got_br, h, w, wp)
    chp = 16
    gd = got_det.reshape(chp, T, h + 2 * pc.PAD, wp)[:ch, :,
                                                     pc.PAD:pc.PAD + h, :w]
    gd = jnp.transpose(gd, (1, 2, 3, 0))

    for t in range(T):
        xin = jnp.concatenate([x1[t:t + 1], x2], axis=-1)
        tmid, _ = conv_block(pa, sa, xin, drop_rate=0.1, rng=rngs[t][0],
                             compute_dtype=BF)
        y, _ = conv_block(pb, sb, tmid, drop_rate=0.1, rng=rngs[t][1],
                          compute_dtype=BF)
        want = detection_conv(det, y, compute_dtype=BF)
        np.testing.assert_allclose(np.asarray(gd[t:t + 1], np.float32),
                                   np.asarray(want, np.float32), **TOL)
        np.testing.assert_allclose(np.asarray(got_br[t:t + 1], np.float32),
                                   np.asarray(tmid, np.float32), **TOL)


def test_mc_heads_driver_matches_xla_path():
    spec = VariantSpec(Variant.BAYESIAN, 2)
    params, stats = init_yolov3(jax.random.PRNGKey(0), spec)
    r = np.random.default_rng(13)
    img = jnp.asarray(r.uniform(0, 1, (1, 256, 192, 3)), BF)
    rng = jax.random.PRNGKey(42)
    T = 2

    kw = dict(spec=spec, T=T, rng=rng, compute_dtype=BF, fused_early=False)
    want = mc_forward_cf(params, stats, img, fused_heads=False, **kw)
    got = mc_forward_cf(params, stats, img, fused_heads=True, **kw)
    assert len(got) == len(want) == 3
    for (g, gs), (wnt, ws) in zip(got, want):
        assert gs == ws and g.shape == wnt.shape
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(wnt, np.float32),
                                   rtol=0.1, atol=0.1)

    again = mc_forward_cf(params, stats, img, fused_heads=True, **kw)
    for (g, _), (a, _) in zip(got, again):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(a))


def test_trans_upsample_matches_xla():
    from bayesian_yolov3_tpu.ops.common import upsample2x

    h, w, wp, c1, c2, T = 16, 30, 64, 32, 16, 2
    r = np.random.default_rng(14)
    x = jnp.asarray(r.normal(0, 1, (T, h, w, c1)), BF)
    p, s = _params(15, 1, c1, c2)

    xf = pc.pack_nhwc_to_flat_cf(x, wp)
    got = ph.fused_trans_upsample_cf(xf, p["w"], _bn(p, s),
                                     h=h, w_real=w, wp=wp, interpret=True)
    flat = np.asarray(got, np.float32)
    # chain invariant at the 2x geometry: pad rows and dead cols zeroed
    g4 = flat.reshape(T, c2, 2 * h + 2 * pc.PAD, 2 * wp)
    assert (g4[:, :, :pc.PAD] == 0).all() and (g4[:, :, -pc.PAD:] == 0).all()
    assert (g4[:, :, :, 2 * w:] == 0).all()
    got = pc.unpack_flat_cf_to_nhwc(got, 2 * h, 2 * w, 2 * wp)

    want, _ = conv_block(p, s, x, compute_dtype=BF)
    want = upsample2x(want)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), **TOL)
