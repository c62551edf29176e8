"""Fused early-backbone Pallas kernels vs the XLA conv path.

Both paths run bf16 convs with f32 accumulation and identical math
(conv + folded BN + LeakyReLU, lib_yolo/layers.py:505-574 semantics), so
they must agree to bf16 reduction-order noise.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bayesian_yolov3_tpu.models import darknet
from bayesian_yolov3_tpu.ops import pallas_conv as pc
from bayesian_yolov3_tpu.ops.common import conv_block, init_conv_block

BF = jnp.bfloat16
TOL = dict(rtol=0.05, atol=0.05)


def _params(rng, k, cin, cout, seed_stats=True):
    p, s = init_conv_block(jax.random.PRNGKey(rng), k, cin, cout)
    # non-trivial BN statistics so the affine actually tests the fold
    r = np.random.default_rng(rng)
    s = {"mean": jnp.asarray(r.normal(0, 0.3, cout), jnp.float32),
         "var": jnp.asarray(r.uniform(0.5, 2.0, cout), jnp.float32)}
    p = dict(p, gamma=jnp.asarray(r.uniform(0.5, 1.5, cout), jnp.float32),
             beta=jnp.asarray(r.normal(0, 0.2, cout), jnp.float32))
    return p, s


def _bn(p, s):
    return pc.fold_bn(p["gamma"], p["beta"], s["mean"], s["var"])


def test_fused_stem_matches_xla():
    n, H, W = 2, 64, 192
    h2, w2, wp = H // 2, W // 2, 128
    r = np.random.default_rng(0)
    x = jnp.asarray(r.uniform(0, 1, (n, H, W, 3)), jnp.float32)
    p0, s0 = _params(1, 3, 3, 32)
    p1, s1 = _params(2, 3, 32, 64)

    want, _ = conv_block(p0, s0, x, stride=1, compute_dtype=BF)
    want, _ = conv_block(p1, s1, want, stride=2, compute_dtype=BF)

    k3, k2 = darknet._stem_kernels(p0["w"].astype(BF), p1["w"].astype(BF))
    bn1 = pc.fold_bn(jnp.tile(p0["gamma"], 4), jnp.tile(p0["beta"], 4),
                     jnp.tile(s0["mean"], 4), jnp.tile(s0["var"], 4))
    xf = pc.pack_nhwc_to_flat_cf(darknet._space_to_depth(x), wp, c_pad=16)
    got = pc.fused_stem_cf(xf, k3, k2, bn1, _bn(p1, s1),
                           h=h2, w_real=w2, wp=wp, interpret=True)
    got = pc.unpack_flat_cf_to_nhwc(got, h2, w2, wp)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), **TOL)


def test_fused_res_block_matches_xla():
    n, h, w, c = 2, 16, 200, 64
    wp = 256
    r = np.random.default_rng(3)
    x = jnp.asarray(r.normal(0, 1, (n, h, w, c)), BF)
    pa, sa = _params(4, 1, c, c // 2)
    pb, sb = _params(5, 3, c // 2, c)

    t, _ = conv_block(pa, sa, x, stride=1, compute_dtype=BF)
    t, _ = conv_block(pb, sb, t, stride=1, compute_dtype=BF)
    want = t + x

    xf = pc.pack_nhwc_to_flat_cf(x, wp)
    got = pc.fused_res_block_cf(xf, pa["w"], pb["w"], _bn(pa, sa),
                                _bn(pb, sb), h=h, w_real=w, wp=wp,
                                interpret=True)
    got = pc.unpack_flat_cf_to_nhwc(got, h, w, wp)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), **TOL)
    # chain convention: pad rows and dead columns come back zeroed
    flat = np.asarray(pc.fused_res_block_cf(
        xf, pa["w"], pb["w"], _bn(pa, sa), _bn(pb, sb),
        h=h, w_real=w, wp=wp, interpret=True), np.float32)
    grid = flat.reshape(n, c, h + 2 * pc.PAD, wp)
    assert np.all(grid[:, :, :pc.PAD, :] == 0)
    assert np.all(grid[:, :, -pc.PAD:, :] == 0)
    assert np.all(grid[:, :, :, w:] == 0)


def test_fused_downsample_matches_xla():
    n, h, w, c = 2, 32, 200, 64
    wp, hw = 256, 128
    r = np.random.default_rng(6)
    x = jnp.asarray(r.normal(0, 1, (n, h, w, c)), BF)
    p, s = _params(7, 3, c, 2 * c)

    want, _ = conv_block(p, s, x, stride=2, compute_dtype=BF)

    xf = pc.pack_nhwc_to_flat_cf(x, wp)
    even, odd = pc.split_cols_flat(xf, wp)
    got = pc.fused_downsample_cf(even, odd, p["w"], _bn(p, s),
                                 h_out=h // 2, w_real_out=w // 2, hw=hw,
                                 interpret=True)
    got = pc.unpack_flat_cf_to_nhwc(got, h // 2, w // 2, hw)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), **TOL)


def test_fused_downsample_packed_matches_xla():
    """pack_phases res block + packed downsample == XLA res block +
    stride-2 conv (the production chain, no XLA split pass)."""
    n, h, w, c = 2, 32, 200, 64
    wp, hw = 256, 128
    r = np.random.default_rng(11)
    x = jnp.asarray(r.normal(0, 1, (n, h, w, c)), BF)
    pa, sa = _params(12, 1, c, c // 2)
    pb, sb = _params(13, 3, c // 2, c)
    pd, sd = _params(14, 3, c, 2 * c)

    t, _ = conv_block(pa, sa, x, stride=1, compute_dtype=BF)
    t, _ = conv_block(pb, sb, t, stride=1, compute_dtype=BF)
    want, _ = conv_block(pd, sd, t + x, stride=2, compute_dtype=BF)

    xf = pc.pack_nhwc_to_flat_cf(x, wp)
    mid = pc.fused_res_block_cf(xf, pa["w"], pb["w"], _bn(pa, sa),
                                _bn(pb, sb), h=h, w_real=w, wp=wp,
                                pack_phases=True, interpret=True)
    got = pc.fused_downsample_packed_cf(mid, pd["w"], _bn(pd, sd),
                                        h_out=h // 2, w_real_out=w // 2,
                                        wp_in=wp, interpret=True)
    got = pc.unpack_flat_cf_to_nhwc(got, h // 2, w // 2, hw)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), **TOL)


def test_darknet_fused_early_matches_xla_backbone():
    """Whole-backbone check: fused_early=True vs the plain XLA path."""
    params, stats = darknet.init_darknet53(jax.random.PRNGKey(0))
    r = np.random.default_rng(9)
    x = jnp.asarray(r.uniform(0, 1, (1, 64, 384, 3)), jnp.float32)
    want = darknet.darknet53(params, stats, x, training=False,
                             compute_dtype=BF, fused_early=False)
    got = darknet.darknet53(params, stats, x, training=False,
                            compute_dtype=BF, fused_early=True)
    for g, w_, name in [(got[0], want[0], "out32"), (got[1], want[1],
                        "skip16"), (got[2], want[2], "skip8")]:
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(w_, np.float32),
            err_msg=name, **TOL)


def test_darknet_fused_256_stage_extension_matches_xla():
    """When the geometry allows (hw % 256 == 0, H/8 row-tileable) the
    fused chain continues through the whole 256-stage (convs 9-25) and
    emits the stride-8 skip directly — a measured 27% win over XLA at
    the ECP batch-11 shape (round-4 probe, BENCH_NOTES.md).  W=1920
    (the ECP width: wp=1024, hw=512) triggers it; the (64,384) test
    above covers the non-extended gate.  (W with W/2 % 256 == 0 must
    NOT take the fused path at all: no dead lanes to absorb the
    kernels' circular column shifts — _fused_early_ok.)"""
    params, stats = darknet.init_darknet53(jax.random.PRNGKey(2))
    r = np.random.default_rng(10)
    x = jnp.asarray(r.uniform(0, 1, (1, 64, 1920, 3)), jnp.float32)
    want = darknet.darknet53(params, stats, x, training=False,
                             compute_dtype=BF, fused_early=False)
    got = darknet.darknet53(params, stats, x, training=False,
                            compute_dtype=BF, fused_early=True)
    # extension sanity: the fused chain must actually have run convs 9-25
    h, i, skip8 = darknet._fused_early_stages(params, stats, x, BF)
    assert i == 26 and skip8 is not None and skip8.shape == (1, 8, 240, 256)
    for g, w_, name in [(got[0], want[0], "out32"), (got[1], want[1],
                        "skip16"), (got[2], want[2], "skip8")]:
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(w_, np.float32),
            err_msg=name, **TOL)


def test_pack_planes_host_matches_device_pack():
    """The host u8 pack twin produces the device pack's layout exactly
    (same channel order, pads, lane pitch) up to the u8->f32 scale."""
    from bayesian_yolov3_tpu.data.pipeline import pack_planes_host

    r = np.random.default_rng(11)
    img8 = r.integers(0, 256, (64, 384, 3), dtype=np.uint8)
    host = pack_planes_host(img8)  # (16, L) u8
    w2 = 384 // 2
    wp = -(-w2 // 256) * 256
    dev = pc.pack_nhwc_to_flat_cf(
        darknet._space_to_depth(
            jnp.asarray(img8[None], jnp.float32) / 255.0),
        wp, c_pad=16)
    np.testing.assert_allclose(
        host.astype(np.float32) / 255.0,
        np.asarray(dev[0], np.float32), atol=3e-3)


def test_darknet_packed_input_matches_image():
    """darknet53 fed host-packed u8 planes == fed the NHWC image."""
    from bayesian_yolov3_tpu.data.pipeline import pack_planes_host

    params, stats = darknet.init_darknet53(jax.random.PRNGKey(1))
    r = np.random.default_rng(12)
    img8 = r.integers(0, 256, (64, 384, 3), dtype=np.uint8)
    imgf = jnp.asarray(img8[None], jnp.float32) / 255.0
    want = darknet.darknet53(params, stats, imgf, training=False,
                             compute_dtype=BF, fused_early=True)
    planes = jnp.asarray(pack_planes_host(img8)[None])  # (1, 16, L) u8
    got = darknet.darknet53(params, stats, planes, training=False,
                            compute_dtype=BF, packed_hw=(64, 384))
    for g, w_, name in [(got[0], want[0], "out32"), (got[1], want[1],
                        "skip16"), (got[2], want[2], "skip8")]:
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(w_, np.float32),
            err_msg=name, **TOL)


def test_fused_early_randomized_geometry_sweep(rng):
    """Randomized width sweep over the fused-chain gate boundaries
    (VERDICT r4 #8: the round-4 lane-wrap bug sat latent because the test
    widths never hit a W/2 % 256 == 0 geometry).

    For every sampled geometry one of two things must hold: the fused
    chain matches the XLA backbone, or the chain's entry assert refuses
    the geometry (dead-lane-free widths, where the kernels' circular 3x3
    column rotate would wrap edge pixels).  Widths cover lane-pitch
    multiples, odd paddings, and the exact boundary W=512.
    """
    params, stats = darknet.init_darknet53(jax.random.PRNGKey(0))
    # multiples of 32 around the wp=256 lane pitch: random draws + the
    # exact dangerous boundary (W % 512 == 0) + its neighbors
    pool = [w for w in range(192, 640, 32) if w != 512]
    widths = sorted(rng.choice(pool, size=3, replace=False)) + [480, 512, 544]
    for W in dict.fromkeys(int(w) for w in widths):
        x = jnp.asarray(
            np.random.default_rng(W).uniform(0, 1, (1, 64, W, 3)),
            jnp.float32)
        if (W // 2) % 256 == 0:
            # the gate: _fused_early_ok keeps this on XLA; FORCING the
            # fused chain must refuse rather than compute wrong numbers
            assert not darknet._fused_early_ok(
                jnp.asarray(x, BF), False, BF) or \
                jax.default_backend() != "tpu"
            with pytest.raises(AssertionError, match="multiple of 256"):
                darknet.darknet53(params, stats, x, training=False,
                                  compute_dtype=BF, fused_early=True)
            continue
        want = darknet.darknet53(params, stats, x, training=False,
                                 compute_dtype=BF, fused_early=False)
        got = darknet.darknet53(params, stats, x, training=False,
                                compute_dtype=BF, fused_early=True)
        for g, w_, name in [(got[0], want[0], "out32"),
                            (got[1], want[1], "skip16"),
                            (got[2], want[2], "skip8")]:
            np.testing.assert_allclose(
                np.asarray(g, np.float32), np.asarray(w_, np.float32),
                err_msg=f"W={W} {name}", **TOL)
