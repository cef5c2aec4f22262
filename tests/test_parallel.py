"""Multi-device tests over the 8-virtual-CPU-device mesh (SURVEY.md §4c)."""

import jax
import numpy as np
import pytest

requires_8 = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 virtual devices")


@requires_8
def test_dryrun_train_step_8_devices():
    from morphganformer_tpu.training.train_step import dryrun_train_step
    dryrun_train_step(8)


@requires_8
def test_generation_batch_sharded_matches_single_device():
    """Sharding the batch over the mesh must not change the math."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from morphganformer_tpu.models import init_generator
    from morphganformer_tpu.training.train_step import make_data_mesh
    from tests.test_models import small_cfg

    cfg = small_cfg()
    model, variables = init_generator(cfg, seed=0, batch=8)
    z = jax.random.normal(jax.random.PRNGKey(0), (8, cfg.k, cfg.z_dim))

    ref = model.apply(variables, z, noise_mode="const")

    mesh = make_data_mesh()
    z_sharded = jax.device_put(z, NamedSharding(mesh, P("data")))
    vars_rep = jax.device_put(variables, NamedSharding(mesh, P()))
    with mesh:
        out = jax.jit(lambda v, zz: model.apply(v, zz, noise_mode="const"))(
            vars_rep, z_sharded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
