import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rivslam_tpu.core import lie
from rivslam_tpu.core.navstate import GRAVITY, NavState
from rivslam_tpu.factors import preintegration as pre

G_VEC = np.array([0.0, 0.0, GRAVITY])


def simulate_imu(n=100, dt=0.005, seed=0, bg=None, ba=None):
    """Analytic trajectory: constant body angular velocity + sinusoid world
    accel. Returns imu samples (biased) + ground-truth start/end NavStates."""
    rng = np.random.default_rng(seed)
    omega_b = np.array([0.1, -0.2, 0.3])
    bg = np.zeros(3) if bg is None else bg
    ba = np.zeros(3) if ba is None else ba

    R = np.eye(3)
    p = np.zeros(3)
    v = np.array([1.0, 0.0, 0.0])
    R0, p0, v0 = R.copy(), p.copy(), v.copy()

    accs, gyrs = [], []
    # integrate with small substeps for smooth ground truth
    for i in range(n):
        t = i * dt
        a_w = np.array([0.3 * np.sin(t * 3), -0.2, 0.1 * np.cos(t * 2)])
        f_b = R.T @ (a_w + G_VEC)  # specific force
        accs.append(f_b + ba)
        gyrs.append(omega_b + bg)
        # ground truth propagate (sub-stepped RK-ish)
        sub = 10
        for _ in range(sub):
            h = dt / sub
            p = p + v * h + 0.5 * a_w * h * h
            v = v + a_w * h
            R = R @ np.asarray(lie.so3_exp(jnp.asarray(omega_b * h, dtype=jnp.float64)))
    return (
        np.full(n, dt),
        np.array(accs),
        np.array(gyrs),
        (R0, p0, v0),
        (R, p, v),
        n * dt,
    )


def run_preint(dts, accs, gyrs, bg=np.zeros(3), ba=np.zeros(3), pad=0):
    k = len(dts) + pad
    m = np.zeros(k, dtype=bool)
    m[: len(dts)] = True
    dts_p = np.zeros(k)
    dts_p[: len(dts)] = dts
    accs_p = np.zeros((k, 3))
    accs_p[: len(dts)] = accs
    gyrs_p = np.zeros((k, 3))
    gyrs_p[: len(dts)] = gyrs
    return pre.preintegrate(
        jnp.asarray(dts_p),
        jnp.asarray(accs_p),
        jnp.asarray(gyrs_p),
        jnp.asarray(m),
        jnp.asarray(bg, dtype=jnp.float64),
        jnp.asarray(ba, dtype=jnp.float64),
        noise_gyro=1e-3,
        noise_acc=1e-2,
    )


def test_predict_matches_ground_truth():
    dts, accs, gyrs, (R0, p0, v0), (R1, p1, v1), T = simulate_imu()
    p_int = run_preint(dts, accs, gyrs)
    start = NavState(
        t=jnp.asarray(0.0, jnp.float64),
        R=jnp.asarray(R0),
        p=jnp.asarray(p0),
        v=jnp.asarray(v0),
        bg=jnp.zeros(3, dtype=jnp.float64),
        ba=jnp.zeros(3, dtype=jnp.float64),
    )
    end = pre.predict(start, p_int)
    # midpoint scheme discretization error at dt=5ms over 0.5s
    np.testing.assert_allclose(np.asarray(end.R), R1, atol=5e-4)
    np.testing.assert_allclose(np.asarray(end.v), v1, atol=5e-3)
    np.testing.assert_allclose(np.asarray(end.p), p1, atol=3e-3)
    assert abs(float(p_int.dt) - T) < 1e-12


def test_masked_padding_is_noop():
    dts, accs, gyrs, *_ = simulate_imu(n=50)
    a = run_preint(dts, accs, gyrs, pad=0)
    b = run_preint(dts, accs, gyrs, pad=14)
    for fa, fb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(fa), np.asarray(fb), atol=1e-14)


def test_bias_correction_first_order():
    """GetDelta*(b) corrections match re-integration with perturbed bias
    (imu_preintegration.cpp:74-82) — the finite-difference test SURVEY §4
    calls for."""
    dts, accs, gyrs, *_ = simulate_imu(n=80)
    p0 = run_preint(dts, accs, gyrs)
    db_g = np.array([1e-3, -2e-3, 1.5e-3])
    db_a = np.array([5e-3, 1e-3, -2e-3])
    # corrected via Jacobians
    dR_corr = pre.delta_rotation(p0, jnp.asarray(db_g))
    dv_corr = pre.delta_velocity(p0, jnp.asarray(db_g), jnp.asarray(db_a))
    dp_corr = pre.delta_position(p0, jnp.asarray(db_g), jnp.asarray(db_a))
    # re-integrated with bias actually applied
    p1 = run_preint(dts, accs, gyrs, bg=db_g, ba=db_a)
    np.testing.assert_allclose(np.asarray(dR_corr), np.asarray(p1.dR), atol=5e-6)
    np.testing.assert_allclose(np.asarray(dv_corr), np.asarray(p1.dv), atol=5e-4)
    np.testing.assert_allclose(np.asarray(dp_corr), np.asarray(p1.dp), atol=5e-4)


def test_covariance_psd_and_growth():
    dts, accs, gyrs, *_ = simulate_imu(n=60)
    p_short = run_preint(dts[:20], accs[:20], gyrs[:20])
    p_long = run_preint(dts, accs, gyrs)
    for p in (p_short, p_long):
        vals = np.linalg.eigvalsh(np.asarray(p.cov))
        assert (vals > -1e-12).all()
    assert np.trace(np.asarray(p_long.cov)) > np.trace(np.asarray(p_short.cov))


def test_vmap_over_window():
    dts, accs, gyrs, *_ = simulate_imu(n=40)
    stack = lambda a: jnp.stack([jnp.asarray(a)] * 4)
    f = jax.vmap(
        lambda d, a, g: pre.preintegrate(
            d, a, g, jnp.ones(40, dtype=bool), jnp.zeros(3, dtype=jnp.float64),
            jnp.zeros(3, dtype=jnp.float64), 1e-3, 1e-2,
        )
    )
    out = f(stack(dts), stack(accs), stack(gyrs))
    assert out.dR.shape == (4, 3, 3)
    single = run_preint(dts, accs, gyrs)
    np.testing.assert_allclose(np.asarray(out.dR[0]), np.asarray(single.dR), atol=1e-14)
