import jax
import jax.numpy as jnp
import numpy as np

from isokann_tpu.simulators import Doublewell, Triplewell, MuellerBrown


def test_doublewell_potential():
    dw = Doublewell()
    assert float(dw.potential(jnp.array([1.0]))) == 0.0
    assert float(dw.potential(jnp.array([0.0]))) == 1.0


def test_force_is_negative_gradient():
    dw = Doublewell()
    x = jnp.array([[0.5]])
    f = dw.force(x)
    # V = (x^2-1)^2, dV/dx = 4x(x^2-1) -> at 0.5: 4*0.5*(-0.75) = -1.5
    assert np.allclose(f, 1.5, atol=1e-5)


def test_randx0_in_support(key):
    tw = Triplewell()
    x0 = tw.randx0(100, key=key)
    assert x0.shape == (100, 2)
    assert float(x0[:, 0].min()) >= -2 and float(x0[:, 0].max()) <= 2
    assert float(x0[:, 1].min()) >= -1.5 and float(x0[:, 1].max()) <= 2.5


def test_propagate_shape(key):
    dw = Doublewell()
    x0 = dw.randx0(10, key=key)
    ys = dw.propagate(x0, 3, key=key)
    assert ys.shape == (10, 3, 1)
    assert np.all(np.isfinite(np.asarray(ys)))


def test_propagate_stays_in_wells(key):
    # low noise -> walkers relax into the wells at +-1
    dw = Doublewell(sigma=0.1)
    x0 = jnp.asarray(np.random.uniform(-1.5, 1.5, size=(50, 1)), jnp.float32)
    ys = dw.propagate(x0, 1, key=key)
    assert np.all(np.abs(np.abs(np.asarray(ys)) - 1.0) < 0.3)


def test_trajectory_shapes(key):
    dw = Doublewell()
    traj = dw.trajectory(T=1.0, x0=jnp.array([0.0]), saveat=0.1, key=key)
    assert traj.shape == (10, 1)
    lt = dw.laggedtrajectory(5, x0=jnp.array([0.0]), key=key)
    assert lt.shape == (5, 1)


def test_muellerbrown_minimum():
    mb = MuellerBrown()
    # global minimum near (-0.558, 1.442)
    v_min = float(mb.potential(jnp.array([-0.558, 1.442])))
    v_other = float(mb.potential(jnp.array([0.0, 0.0])))
    assert v_min < -140
    assert v_min < v_other


def test_propagate_statistics(key):
    # For an OU-like quadratic well V=x^2 (force -2x), stationary var = sigma^2/4... check EM sanity
    from isokann_tpu.simulators import Diffusion
    d = Diffusion(potential=lambda x: jnp.sum(x**2), dim_=1, sigma=1.0,
                  dt=0.01, lagtime_=5.0, support=1.0)
    x0 = jnp.zeros((500, 1))
    ys = d.propagate(x0, 1, key=key)
    # stationary distribution N(0, sigma^2/(2*k)) with k=2 -> var = 0.25
    var = float(np.var(np.asarray(ys)))
    assert abs(var - 0.25) < 0.07
