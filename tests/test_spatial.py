"""Spatial (H-axis) sharding: partitioned convs must match single-device.

The 8-virtual-device CPU mesh (conftest) stands in for an ICI slice; the
compiled program must contain the halo collectives GSPMD inserts for
spatially partitioned 3x3 convs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bayesian_yolov3_tpu.core.blueprint import Variant, VariantSpec
from bayesian_yolov3_tpu.core.priors import ECP_9_PRIORS
from bayesian_yolov3_tpu.models.yolov3 import YoloV3
from bayesian_yolov3_tpu.parallel import mesh as mesh_lib
from bayesian_yolov3_tpu.parallel.spatial import make_spatial_sharded_forward

IMG = (128, 96, 3)  # H=128 -> 16 rows per shard on 8 devices


@pytest.mark.parametrize("variant", ["standard", "aleatoric"])
def test_spatial_sharded_forward_matches_single_device(rng, variant):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    model = YoloV3(spec=VariantSpec(Variant(variant), 2), priors=ECP_9_PRIORS,
                   img_size=IMG, compute_dtype="float32")
    params, stats = model.init(jax.random.PRNGKey(0))
    imgs = jnp.asarray(rng.uniform(0, 1, (2, *IMG)), jnp.float32)

    mesh = mesh_lib.make_mesh({"sp": 8})
    fwd = make_spatial_sharded_forward(model, mesh)
    params_r = jax.device_put(params, mesh_lib.replicated(mesh))
    stats_r = jax.device_put(stats, mesh_lib.replicated(mesh))

    got = fwd(params_r, stats_r, imgs, None)
    want, _ = model.forward(params, stats, imgs, training=False)

    lowered = fwd.lower(params_r, stats_r, imgs, None)
    hlo = lowered.compile().as_text()
    assert ("collective-permute" in hlo) or ("all-gather" in hlo), (
        "expected GSPMD halo/gather collectives in the partitioned program"
    )
    for g, w in zip(got, want):
        assert len(g.sharding.device_set) == 8  # replicated over the mesh
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-5, atol=2e-5
        )
