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

from ..ops.common import conv_block, init_conv_block

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


def darknet53(
    params: Dict,
    stats: Dict,
    x,
    *,
    training: bool = False,
    compute_dtype=jnp.float32,
):
    """Run the backbone.  Returns (out_s32, skip_s16, skip_s8, new_stats).

    ``training`` here is the *backbone* BN mode: False when the backbone is
    frozen (the default training config, reference yolov3.py:240-243), in
    which case BN uses moving statistics and stats pass through unchanged.
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

    i = 0
    h = block(i, x, 1)
    i += 1
    skip8 = skip16 = None
    for cout, blocks in _STAGES:
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
