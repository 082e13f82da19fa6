"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from isokann_tpu.models import pairnet, smallnet
from isokann_tpu.optim import AdamRegularized
from isokann_tpu.parallel import (
    make_mesh, shard_batch, replicate, sharded_train_step,
    sharded_propagate, distributed_iso_step,
)
from isokann_tpu.simulators import Doublewell, MDSimulation


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    return make_mesh(8)


def test_shard_batch_places_on_mesh(mesh):
    x = jnp.zeros((16, 4))
    xs = shard_batch(mesh, x)
    assert len(xs.sharding.device_set) == 8


def test_sharded_train_step_matches_single_device(mesh, key):
    """The sharded step must be numerically identical to the local step."""
    model = smallnet(2, key=key)
    opt = AdamRegularized()
    opt_state = opt.init(model.params)

    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(16, 2)), jnp.float32)
    ys = jnp.asarray(rng.normal(size=(16, 3, 2)), jnp.float32)
    yw = jnp.ones((16, 3), jnp.float32)

    step = sharded_train_step(mesh, model.apply, opt)
    p1, s1, loss1 = step(replicate(mesh, model.params),
                         replicate(mesh, opt_state),
                         shard_batch(mesh, xs), shard_batch(mesh, ys),
                         shard_batch(mesh, yw), key)

    # local reference computation
    def local(params, opt_state):
        kchi = jnp.mean(model.apply(params, ys), axis=1)
        lo, hi = jnp.min(kchi), jnp.max(kchi)
        target = (kchi - lo) / (hi - lo)
        def lossf(p):
            return jnp.sum((model.apply(p, xs) - target) ** 2) / xs.shape[0]
        loss, g = jax.value_and_grad(lossf)(params)
        up, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, up), opt_state, loss

    p2, s2, loss2 = local(model.params, opt_state)
    assert float(loss1) == pytest.approx(float(loss2), rel=1e-5)
    l1 = jax.tree_util.tree_leaves(p1)
    l2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(l1, l2):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sharded_propagate(mesh, key):
    dw = Doublewell()
    stepper = dw._stepper(dw.steps)
    x0 = dw.randx0(32, key=key)
    y = sharded_propagate(mesh, lambda x, k: stepper(x, k), x0, key)
    assert y.shape == (32, 1)
    assert len(y.sharding.device_set) == 8
    assert np.all(np.isfinite(np.asarray(y)))


def test_distributed_iso_step_md(mesh, key):
    """Full fused distributed step on the MD system."""
    sim = MDSimulation(steps=2)
    model = pairnet(n=231, nout=1, key=key)
    opt = AdamRegularized()
    step = distributed_iso_step(mesh, sim, model.apply, opt, nk=2,
                                featurizer=sim.featurizer)
    x0 = shard_batch(mesh, jnp.tile(sim.coords[None, :], (16, 1)))
    params = replicate(mesh, model.params)
    opt_state = replicate(mesh, opt.init(model.params))
    params, opt_state, loss, ys = step(params, opt_state, x0, key)
    assert np.isfinite(float(loss))
    assert ys.shape == (16, 2, 66)


def test_distributed_iso_step_langevin(mesh, key):
    sim = Doublewell()
    model = smallnet(1, key=key)
    opt = AdamRegularized()
    step = distributed_iso_step(mesh, sim, model.apply, opt, nk=4)
    x0 = shard_batch(mesh, sim.randx0(16, key=key))
    params = replicate(mesh, model.params)
    opt_state = replicate(mesh, opt.init(model.params))
    params, opt_state, loss, ys = step(params, opt_state, x0, key)
    assert np.isfinite(float(loss))
    assert ys.shape == (16, 4, 1)


def test_shardmap_explicit_collectives_matches_gspmd(mesh, key):
    """shard_map step with hand-written pmin/pmax/pmean == the GSPMD
    sharded step == the local computation."""
    from isokann_tpu.parallel.mesh import shardmap_train_step

    model = smallnet(2, key=key)
    opt = AdamRegularized()
    opt_state = opt.init(model.params)
    rng = np.random.default_rng(1)
    xs = jnp.asarray(rng.normal(size=(16, 2)), jnp.float32)
    ys = jnp.asarray(rng.normal(size=(16, 3, 2)), jnp.float32)
    yw = jnp.ones((16, 3), jnp.float32)

    s1 = sharded_train_step(mesh, model.apply, opt)
    p1, _, loss1 = s1(replicate(mesh, model.params), replicate(mesh, opt_state),
                      shard_batch(mesh, xs), shard_batch(mesh, ys),
                      shard_batch(mesh, yw), key)

    s2 = shardmap_train_step(mesh, model.apply, opt)
    p2, _, loss2 = s2(replicate(mesh, model.params), replicate(mesh, opt_state),
                      shard_batch(mesh, xs), shard_batch(mesh, ys),
                      shard_batch(mesh, yw), key)

    # GSPMD step divides by global n with global-sum grads; shardmap uses
    # pmean of local-mean grads = same thing for equal shards
    assert float(loss1) == pytest.approx(float(loss2), rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_distributed_helpers():
    """Multi-host helpers degrade to single-process semantics."""
    from isokann_tpu.parallel import distributed as D
    import numpy as np
    D.initialize()                      # no-op single-process
    mesh = D.global_mesh()
    x = np.arange(16.0 * 3).reshape(16, 3)
    g = D.host_local_batch(mesh, x)
    assert g.shape == (16, 3)
    assert np.allclose(np.asarray(g), x)
    sl = D.process_slice(100)
    assert sl == slice(0, 100)


def test_propagate_walker_sharding():
    """MDSimulation.propagate shards walkers over the (virtual 8-device)
    mesh; embarrassingly parallel, so the sharded result equals the
    single-device computation for the same key."""
    import jax
    import isokann_tpu as itk

    assert jax.device_count() >= 8
    sim = itk.MDSimulation(steps=5)
    x0 = np.tile(np.asarray(sim.coords)[None], (8, 1))
    key = jax.random.PRNGKey(7)
    ys = sim.propagate(x0, 2, key=key)
    assert np.isfinite(np.asarray(ys)).all()
    # unsharded reference: drive the cached program with replicated inputs
    import jax.numpy as jnp
    run = sim._propagate_fn(16, 5, False)
    ys_ref = np.asarray(run(jnp.repeat(jnp.asarray(x0), 2, axis=0),
                            key)[:16]).reshape(8, 2, -1)
    assert np.allclose(np.asarray(ys), ys_ref, atol=1e-5)


def test_iso_run_sharded_matches_unsharded(key):
    """The PRODUCTION fused trainer (`Iso.run` -> `_run_fused`) with GSPMD
    sharding over the 8-device mesh must match the unsharded run: fused
    path, padded capacity bucket (nx=40 -> cap=48), full-batch AND
    minibatch gather included (VERDICT r1 Weak #2)."""
    from isokann_tpu import data as D
    from isokann_tpu.iso import Iso, bucket_capacity

    nx = 40
    assert bucket_capacity(nx) % jax.device_count() == 0

    def make(shard, minibatch):
        dw = Doublewell()
        data = D.SimulationData.from_sim(dw, nx=nx, nk=4,
                                         key=jax.random.PRNGKey(0))
        model = smallnet(1, key=jax.random.PRNGKey(1))
        return Iso(data, model=model, opt=AdamRegularized(),
                   shard=shard, minibatch=minibatch,
                   key=jax.random.PRNGKey(2))

    for mb in (0, 16):
        i1 = make(False, mb).run(6)
        i2 = make(True, mb).run(6)
        assert np.allclose(i1.losses, i2.losses, rtol=1e-4, atol=1e-6), \
            (mb, i1.losses, i2.losses)
        for a, b in zip(jax.tree_util.tree_leaves(i1.model.params),
                        jax.tree_util.tree_leaves(i2.model.params)):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_set_default_devices_override():
    """set_default_devices pins the device list make_mesh()/device_count()
    use, so sharded paths stay on the certified mesh even when the default
    backend is something else (the dryrun_multichip failure mode: an axon
    TPU claimed as default made Iso shard-gate on device_count() == 1)."""
    from isokann_tpu.parallel import (make_mesh, set_default_devices,
                                      default_devices, device_count)
    all_dev = jax.devices()
    try:
        set_default_devices(all_dev[:2])
        assert device_count() == 2
        assert default_devices() == all_dev[:2]
        assert make_mesh().size == 2
        # explicit devices always win over the override
        assert make_mesh(devices=all_dev).size == len(all_dev)
    finally:
        set_default_devices(None)
    assert device_count() == len(all_dev)
    assert make_mesh().size == len(all_dev)
