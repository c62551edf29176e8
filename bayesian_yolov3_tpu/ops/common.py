"""Primitive NN blocks: conv + (dropout) + batch-norm + LeakyReLU.

TPU-native equivalents of the reference's delegated TF kernels
(lib_yolo/layers.py:505-635): ``jax.lax.conv_general_dilated`` feeds the MXU;
batch-norm folds to a per-channel affine that XLA fuses into the conv
epilogue; dropout is an on-chip PRNG mask.  Layout is NHWC / HWIO with an
explicit (1,1)/(1,1) pad for stride-2 convs — the darknet/caffe asymmetric
padding (layers.py:616-635) which differs from TF/XLA 'SAME' on even inputs.

Parameters live in plain pytrees::

    params[name] = {'w': (kh,kw,cin,cout), 'gamma': (c,), 'beta': (c,)}
    stats[name]  = {'mean': (c,), 'var': (c,)}          # BN moving stats
    params[det]  = {'w': (1,1,cin,cout), 'b': (cout,)}  # detection head

Trainable state and BN moving statistics are separate trees so the
training step can freeze the backbone (reference yolov3.py:240-243) by
partitioning the params tree alone.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5  # reference layers.py:511,517
BN_MOMENTUM = 0.99  # tf.layers.batch_normalization default
LEAKY_ALPHA = 0.1  # reference layers.py:574

_DN = ("NHWC", "HWIO", "NHWC")


def leaky_relu(x, alpha: float = LEAKY_ALPHA):
    return jnp.where(x >= 0, x, alpha * x)


def conv2d(x, w, *, stride: int = 1, darknet_pad: bool = True, padding=None):
    """2D conv, no bias.  kernel_size in {1,3}, stride in {1,2}.

    stride-1: SAME padding.  stride-2: explicit (1,1)x(1,1) zero pad then
    VALID — darknet/caffe semantics (reference layers.py:527-542,616-635).
    An explicit ``padding`` (lax-style pair list) overrides both.

    Precision: with float32 operands the MXU/oneDNN default silently drops
    to bf16 passes; full-precision mode must be explicit.  bf16 operands use
    the fast default path with f32 accumulation (preferred_element_type).
    """
    k = w.shape[0]
    if padding is not None:
        pass
    elif stride == 1:
        padding = "SAME"
    elif darknet_pad:
        assert k == 3, "stride-2 darknet conv requires 3x3 kernel"
        padding = ((1, 1), (1, 1))
    else:
        padding = "SAME"
    f32 = x.dtype == jnp.float32
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=_DN,
        # f32 operands: force true f32 passes (the default silently uses
        # bf16).  bf16 operands: bf16 output keeps fwd/bwd dtypes uniform
        # (standard mixed precision; the MXU accumulates f32 internally).
        precision=jax.lax.Precision.HIGHEST if f32 else None,
        preferred_element_type=jnp.float32 if f32 else None,
    )


KEEP_THRESH_16 = 58982  # = min(round(0.9 * 65536), 65535); keep-prob 0.9 quantized


def hash_keep(idx, key, thresh):
    """The fused-dropout Bernoulli draw: keep iff lowbias32-style
    hash(idx, key) & 0xFFFF < thresh.

    idx/key/thresh: uint32.  The key enters twice: xor at entry AND
    additively between the finalizer rounds.  With the xor alone, any two
    keys' masks would be exact index-translates of each other
    (mask_k2(i) == mask_k1(i ^ (k1^k2))) — a structural pairwise dependence
    between MC samples that deviates from the iid assumption behind the
    epistemic variance.  The mid-pipeline add makes distinct keys distinct
    functions, not index permutations (test_mc_dropout.py key-translate
    test).

    Single source of truth for every mask draw (``dropout`` and the
    fixed-mask key tables) — any kernel that re-evaluates it in-register
    draws bit-identical masks.
    """
    h = idx ^ key
    h = (h ^ (h >> 16)) * jnp.uint32(0x7FEB352D)
    h = h + key
    h = (h ^ (h >> 15)) * jnp.uint32(0x846CA68B)
    h = h ^ (h >> 16)
    return (h & jnp.uint32(0xFFFF)) < thresh


def dropout(x, rate: float, rng, impl: str = "hash", key_u32=None):
    """Inverted dropout (tf.layers.dropout semantics, layers.py:521-524).

    ``impl="hash"`` (default): the Bernoulli draw is a fused elementwise
    hash of (flat_index ^ key32) — lowbias32 finalizer rounds, low 16 bits
    compared against the keep threshold.  At T=30 ECP resolution the
    MC-dropout masks are ~1.4e9 elements/image; a materialized random-bits
    buffer costs its HBM round trip per dropout site, while the hash fuses
    into the surrounding elementwise graph with ZERO mask memory traffic
    (measured 3.7x cheaper at the dominant head-3 site, BENCH_NOTES.md).
    lowbias32 is a bijection on u32 with near-ideal avalanche; dropout
    needs uniform marginals and no structural correlation with the data,
    both of which hold (statistical tests in tests/test_mc_dropout.py).

    ``impl="bits"``: the prior path — a u16 ``jax.random.bits`` buffer
    thresholded per element (kept for A/B measurement and as the
    conservative fallback).

    ``key_u32``: bypass the PRNG draw and use this uint32 scalar as the
    hash key directly (``rng`` is then ignored and may be None).  When the
    scalar is a compile-time constant this removes the mask's dependence
    on runtime state, letting XLA fuse the draw into the producing conv's
    epilogue instead of a separate full-tensor pass — the fixed-MC-masks
    fast path (see models.yolov3.mc_forward_cf ``fixed_masks``).

    Keep-prob quantization is <= 2**-16 either way (keep=0.9 becomes
    58982/65536 = 0.899994), far below the MC noise floor at any
    practical T.  Same (key, shape) -> same mask: reproducible.
    """
    keep = 1.0 - rate
    if impl == "bits":
        assert key_u32 is None, "impl='bits' draws from the PRNG key"
        thresh = jnp.uint16(min(round(keep * 65536.0), 65535))
        bits = jax.random.bits(rng, x.shape, jnp.uint16)
        return jnp.where(bits < thresh, x / keep, jnp.zeros_like(x)).astype(x.dtype)
    assert impl == "hash", impl
    thresh = jnp.uint32(min(round(keep * 65536.0), 65535))
    if key_u32 is None:
        key = jax.random.bits(rng, (), jnp.uint32)  # one scalar draw per site
    else:
        key = jnp.asarray(key_u32, jnp.uint32)
    idx = jax.lax.iota(jnp.uint32, x.size).reshape(x.shape)
    return jnp.where(
        hash_keep(idx, key, thresh), x / keep, jnp.zeros_like(x)
    ).astype(x.dtype)


def _bn_affine(gamma, beta, mean, var):
    """Fold BN into per-channel scale/bias (inference / frozen mode)."""
    scale = gamma * jax.lax.rsqrt(var + BN_EPS)
    bias = beta - mean * scale
    return scale, bias


def conv_block(
    params: Dict,
    stats: Dict,
    x,
    *,
    stride: int = 1,
    training: bool = False,
    drop_rate: Optional[float] = None,
    rng=None,
    drop_key_u32=None,
    compute_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, Dict]:
    """conv -> [dropout] -> batch_norm -> LeakyReLU(0.1).

    Ordering parity: dropout runs BEFORE batch norm (reference
    yolov3.py:524-528 normalizer list ['dropout', 'bn']; layers.py:557-574).

    ``drop_key_u32``: fixed-mask dropout key (see ``dropout``); used in
    place of ``rng``.

    Returns (activations, new_stats).  ``new_stats`` equals ``stats`` unless
    ``training`` is True, in which case BN moving statistics are advanced
    with momentum 0.99 over the biased batch variance (TF semantics).
    """
    y = conv2d(x.astype(compute_dtype), params["w"].astype(compute_dtype), stride=stride)

    if drop_rate is not None and drop_rate > 0.0:
        assert rng is not None or drop_key_u32 is not None, "dropout requires a key"
        y = dropout(y, drop_rate, rng, key_u32=drop_key_u32)

    y = y.astype(jnp.float32)  # normalize / batch stats in f32
    gamma, beta = params["gamma"], params["beta"]
    if training:
        mean = jnp.mean(y, axis=(0, 1, 2))
        var = jnp.var(y, axis=(0, 1, 2))
        new_stats = {
            "mean": stats["mean"] * BN_MOMENTUM + mean * (1.0 - BN_MOMENTUM),
            "var": stats["var"] * BN_MOMENTUM + var * (1.0 - BN_MOMENTUM),
        }
    else:
        mean, var = stats["mean"], stats["var"]
        new_stats = stats
    scale, bias = _bn_affine(gamma, beta, mean, var)
    y = y * scale + bias
    return leaky_relu(y).astype(compute_dtype), new_stats


def detection_conv(params: Dict, x, *, compute_dtype=jnp.float32):
    """1x1 linear detection head with bias (layers.py:600-613). Output f32."""
    y = conv2d(x.astype(compute_dtype), params["w"].astype(compute_dtype), stride=1)
    return y.astype(jnp.float32) + params["b"].astype(jnp.float32)


def detection_conv_cf(params: Dict, feats, *, compute_dtype=jnp.float32):
    """Channels-first detection head over stacked MC samples.

    feats: (T, ..., cin) -> (ch, T, prod(...)) float32 (middle dims — e.g.
    image batch x h x w — flatten onto the anchor axis).  The 1x1 conv
    becomes a single MXU contraction whose output layout already matches
    the fused Pallas decoders (anchors on the minor axis) — avoiding the
    ~30 ms XLA transpose of the (T, hw, ch) tensor at ECP resolution.
    """
    t, *mid, cin = feats.shape
    if compute_dtype == jnp.bfloat16 and jax.default_backend() != "tpu":
        # XLA:CPU's DotThunk has no BF16 x BF16 = F32 kernel; run the
        # contraction in f32 there (tests/oracles only — never the TPU path)
        compute_dtype = jnp.float32
    x = feats.reshape(t, int(np.prod(mid)), cin).astype(compute_dtype)
    kernel = params["w"].reshape(cin, -1).astype(compute_dtype)  # (cin, ch)
    out = jax.lax.dot_general(
        kernel, x,
        dimension_numbers=(((0,), (2,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (ch, T, hw)
    return out + params["b"].astype(jnp.float32)[:, None, None]


def upsample2x(x):
    """Nearest-neighbor 2x upsample (layers.py:578-580) via reshape/broadcast."""
    n, h, w, c = x.shape
    y = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return y.reshape(n, 2 * h, 2 * w, c)


# --------------------------------------------------------------------------
# initializers (TF defaults: glorot_uniform kernels, zero bias, BN γ=1 β=0)
# --------------------------------------------------------------------------


def init_conv_block(rng, k: int, cin: int, cout: int):
    w = jax.nn.initializers.glorot_uniform()(rng, (k, k, cin, cout), jnp.float32)
    params = {
        "w": w,
        "gamma": jnp.ones((cout,), jnp.float32),
        "beta": jnp.zeros((cout,), jnp.float32),
    }
    stats = {"mean": jnp.zeros((cout,), jnp.float32), "var": jnp.ones((cout,), jnp.float32)}
    return params, stats


def init_detection_conv(rng, cin: int, cout: int):
    w = jax.nn.initializers.glorot_uniform()(rng, (1, 1, cin, cout), jnp.float32)
    return {"w": w, "b": jnp.zeros((cout,), jnp.float32)}
