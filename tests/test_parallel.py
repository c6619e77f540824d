"""Multi-chip paths on the virtual 8-device CPU mesh."""

def test_device_dataset_sharded_sampling_8_devices(key):
    """HBM-resident dataset sharded over the mesh: each device samples
    its local rows (shard_map, per-device RNG); full train steps run."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mmdgan_tpu.models import SNGan
    from mmdgan_tpu.parallel.mesh import DataParallel
    from mmdgan_tpu.train import init_train_state, multi_opt_config
    from mmdgan_tpu.train.step import build_device_data_step

    arch = {
        "input": [(1, 8, 8)],
        "code": [(8, "linear")],
        "generator": [
            {"name": "l1", "out": 8 * 8, "op": "d", "act": "tanh",
             "act_nm": None, "out_reshape": [1, 8, 8]}],
        "discriminator": [
            {"name": "l1", "out": 4, "op": "d", "act": "lrelu", "w_nm": "s",
             "act_k": 1.0, "in_reshape": [8 * 8]}],
    }
    model = SNGan(arch, num_class=0, loss_type="rep")
    opt_d, opt_g = multi_opt_config([1e-3, 1e-3])
    dp = DataParallel()
    assert dp.num_devices == 8
    builder = build_device_data_step(model, opt_d, opt_g, num_steps=4,
                                     batch_size=32)
    fn = jax.jit(builder.with_mesh(dp.mesh))
    data = jax.device_put(
        np.random.RandomState(0).randint(0, 256, (128, 8, 8, 1), np.uint8),
        NamedSharding(dp.mesh, P("data")))
    ts = dp.replicate(init_train_state(model, key, opt_d, opt_g))
    rng = jax.random.PRNGKey(0)
    on = jnp.ones(())
    ts, rng, m = fn(ts, data, None, rng, on, on)
    ts, rng, m = fn(ts, data, None, rng, on, on)
    assert int(jax.device_get(ts.step)) == 8
    assert np.isfinite(float(np.asarray(m["loss_gen"])[-1]))
