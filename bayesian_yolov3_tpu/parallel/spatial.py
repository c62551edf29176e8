"""Spatial (image-height) sharding for full-resolution inference.

SURVEY §5.7: this model family's long-context analogue is image
RESOLUTION, not sequence length — the scaling axes are T (``mc``) and the
spatial extent of the 1024x1920+ frames.  This module adds the latter as a
first-class mesh axis ``sp``: the image's H dimension is sharded across
devices and GSPMD partitions every conv in the backbone + heads
spatially, inserting the halo exchanges (collective-permutes of the 1-row
borders each 3x3 conv needs) over ICI automatically — the TPU-native
equivalent of hand-written halo kernels.

Memory is the motivation: at batch 1 the full-res activations (the first
conv alone holds 1024x1920x32 per frame) are what bound resolution on one
chip; H-sharding divides every activation by the axis size while keeping
params replicated.  Composes with the ``mc`` axis (mesh {'sp': a, 'mc': b})
for epistemic inference at resolutions one chip cannot hold.

The decoded/NMS stage is global (greedy NMS is sequential over all
anchors), so the raw head outputs are constrained back to replicated
before decode — a gather of the (small) head tensors, not the backbone
activations.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models import darknet
from ..models import yolov3 as Y


def image_sharding(mesh, axis: str = "sp") -> NamedSharding:
    """Sharding of an (N, H, W, C) image batch with H split over ``axis``."""
    return NamedSharding(mesh, P(None, axis, None, None))


def spatial_forward_raws(
    params, stats, imgs, rng, *, spec, mesh, compute_dtype,
    sp_axis: str = "sp", standard_test_dropout: bool = False,
):
    """Traceable H-sharded single forward, for use INSIDE a larger jit.

    Constrains the image batch to P(None, sp) so GSPMD spatially partitions
    every conv (halo exchanges over ICI), and the raw head outputs back to
    replicated so the downstream decode+NMS (global, sequential) runs on
    gathered tensors.  Used by InferenceRunner when config.mesh_shape has an
    ``sp`` axis (standard / aleatoric variants).
    """
    imgs = jax.lax.with_sharding_constraint(imgs, image_sharding(mesh, sp_axis))
    # fused_early=False: GSPMD cannot spatially partition the Pallas
    # early-stage kernels; the XLA conv path shards cleanly
    raws, _ = Y.forward(
        params, stats, imgs, spec=spec, training=False, rng=rng,
        standard_test_dropout=standard_test_dropout,
        compute_dtype=compute_dtype, fused_early=False,
    )
    rep = NamedSharding(mesh, P())
    return tuple(jax.lax.with_sharding_constraint(r, rep) for r in raws)


def spatial_mc_raws(
    params, stats, img, rng, *, spec, mesh, T: int, compute_dtype,
    sp_axis: str = "sp", mc_axis: str | None = None,
):
    """Traceable H-sharded (optionally T-sharded) epistemic MC forward.

    The composed mesh the module docstring promises: the image H axis is
    split over ``sp_axis`` (activation memory / device = 1/sp of
    single-chip — the reference's OOM knob, inference_epistemic.py:221)
    while the T MC-dropout samples are split over ``mc_axis`` when given.
    Returns three (T, h, w, ch) raw tensors constrained to
    P(mc, sp, None, None); the epistemic reduction over T then compiles to
    an ICI all-reduce over ``mc`` and decode/NMS gather over ``sp``.

    The hash-dropout masks are (key, flat-index)-keyed (ops.common.dropout),
    so partitioning changes neither the masks nor the statistics — the
    sharded program computes the same function as single-device.
    """
    assert img.shape[0] == 1, "epistemic inference requires batch_size == 1"
    img = jax.lax.with_sharding_constraint(img, image_sharding(mesh, sp_axis))
    out32, skip16, skip8, _ = darknet.darknet53(
        params["backbone"], stats["backbone"], img,
        training=False, compute_dtype=compute_dtype, fused_early=False,
    )

    def one_sample(key):
        raws, _ = Y._heads(
            params, stats, out32, skip16, skip8,
            spec=spec, training=False, dropout_active=True, rng=key,
            compute_dtype=compute_dtype,
        )
        return tuple(r[0] for r in raws)  # squeeze the batch axis

    keys = jax.random.split(rng, T)
    raws = jax.vmap(one_sample)(keys)
    sh = NamedSharding(mesh, P(mc_axis, sp_axis, None, None))
    return tuple(jax.lax.with_sharding_constraint(r, sh) for r in raws)


def make_spatial_sharded_forward(model, mesh, *, axis: str = "sp"):
    """jit-compiled forward with the image H axis sharded over ``axis``.

    Returns ``fwd(params, stats, imgs, rng) -> (raw1, raw2, raw3)`` with
    replicated outputs (ready for the standard decode+NMS path).  Params
    and stats are replicated; only activations are partitioned.

    The space-to-depth stem stays enabled: its H-dimension reshape is
    shard-local as long as (H / axis_size) is even, which holds for any
    /32-divisible H and power-of-two axis.
    """
    rep = NamedSharding(mesh, P())
    img_sh = NamedSharding(mesh, P(None, axis, None, None))

    def fwd(params, stats, imgs, rng):
        imgs = jax.lax.with_sharding_constraint(imgs, img_sh)
        raws, _ = Y.forward(
            params, stats, imgs, spec=model.spec, training=False, rng=rng,
            compute_dtype=model._dtype, fused_early=False,
        )
        # NMS/decode are global: gather the (small) head outputs
        return tuple(jax.lax.with_sharding_constraint(r, rep) for r in raws)

    return jax.jit(
        fwd,
        in_shardings=(rep, rep, img_sh, rep),
        out_shardings=(rep, rep, rep),
    )
