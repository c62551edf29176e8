"""MC-sample-parallel epistemic inference over a device mesh.

The reference's one real parallel axis is the T MC-dropout samples, batched
on a single GPU via feature-map stacking (SURVEY §2.9).  Here T becomes a
sharded vmap axis: per-sample PRNG keys are placed sharded over the ``mc``
mesh axis and a sharding constraint on the per-sample head outputs makes
GSPMD partition the whole dropout-bearing head computation across chips.
The deterministic backbone runs replicated (it is identical for every
sample); the epistemic reduction (means / covariances over T) compiles to
an ICI all-reduce.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import yolov3 as yolo_lib
from ..models import darknet


def make_mc_sharded_forward(model, mesh: Mesh, T: int, axis: str = "mc"):
    """Build a jitted fn(params, stats, img, rng) -> [raw1, raw2, raw3]
    with the T sample axis sharded over ``axis`` of ``mesh``.

    T must be divisible by the axis size.  Outputs have shape (T, h, w, ch).
    """
    n = mesh.shape[axis]
    assert T % n == 0, f"T={T} not divisible by mc axis size {n}"
    sample_sharding = NamedSharding(mesh, P(axis))
    spec = model.spec
    dtype = model._dtype

    def fn(params, stats, img, keys):
        out32, skip16, skip8, _ = darknet.darknet53(
            params["backbone"], stats["backbone"], img,
            training=False, compute_dtype=dtype,
        )

        def one_sample(key):
            raws, _ = yolo_lib._heads(
                params, stats, out32, skip16, skip8,
                spec=spec, training=False, dropout_active=True, rng=key,
                compute_dtype=dtype,
            )
            return tuple(r[0] for r in raws)

        raws = jax.vmap(one_sample)(keys)
        return [jax.lax.with_sharding_constraint(r, sample_sharding) for r in raws]

    jitted = jax.jit(fn)

    def call(params, stats, img, rng):
        keys = jax.device_put(jax.random.split(rng, T), sample_sharding)
        return jitted(params, stats, img, keys)

    return call
