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

from ..models import yolov3 as Y


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
            compute_dtype=model._dtype,
        )
        # NMS/decode are global: gather the (small) head outputs
        return tuple(jax.lax.with_sharding_constraint(r, rep) for r in raws)

    return jax.jit(
        fwd,
        in_shardings=(rep, rep, img_sh, rep),
        out_shardings=(rep, rep, rep),
    )
