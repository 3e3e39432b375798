"""Multi-chip sharding on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiojax.parallel import make_mesh, replicate, shard_batch, sharded_model_fn


@pytest.mark.skipif(jax.device_count() < 8, reason="needs the 8-device CPU mesh")
def test_dp_sharded_gtcrn_matches_single_device():
    from audiojax.models.gtcrn import GtcrnConfig, gtcrn_forward, init_gtcrn

    cfg = GtcrnConfig()
    params = init_gtcrn(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    audio = jnp.asarray((rng.standard_normal((8, 4096)) * 6000).astype(np.int16))

    ref = np.asarray(gtcrn_forward(params, audio, cfg))

    mesh = make_mesh(8, tp=1)
    fn = sharded_model_fn(mesh, lambda p, a: gtcrn_forward(p, a, cfg))
    out = np.asarray(fn(replicate(mesh, params), shard_batch(mesh, audio)))
    np.testing.assert_allclose(out.astype(np.int32), ref.astype(np.int32), atol=1)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs the 8-device CPU mesh")
def test_dp_tp_mesh_shapes():
    mesh = make_mesh(8, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    with pytest.raises(ValueError, match="not divisible"):
        make_mesh(7, tp=2)
