import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rivslam_tpu.core import lie
from rivslam_tpu.core.config import BackendConfig
from rivslam_tpu.core.navstate import GRAVITY, NavState
from rivslam_tpu.factors import preintegration as pre
from rivslam_tpu.factors import residuals
from rivslam_tpu.solver import window as win

CFG = BackendConfig()
G_VEC = np.array([0.0, 0.0, GRAVITY])
W = 6
FRAME_DT = 0.1
IMU_DT = 0.005
NOISE_GYRO = 1e-3
NOISE_ACC = 1e-2


def make_truth(seed=0):
    """Ground-truth window: smooth accelerating/yawing trajectory."""
    rng = np.random.default_rng(seed)
    omega_b = np.array([0.0, 0.0, 0.25])
    Rs, ps, vs = [np.eye(3)], [np.zeros(3)], [np.array([1.5, 0.0, 0.0])]
    imu = []  # per frame-gap: (dts, accs, gyrs)
    n_sub = int(FRAME_DT / IMU_DT)
    R, p, v = Rs[0].copy(), ps[0].copy(), vs[0].copy()
    t = 0.0
    for k in range(W - 1):
        accs, gyrs = [], []
        for i in range(n_sub):
            a_w = np.array([0.2 * np.sin(t), 0.3 * np.cos(t), 0.05 * np.sin(2 * t)])
            accs.append(R.T @ (a_w + G_VEC))
            gyrs.append(omega_b.copy())
            sub = 5
            for _ in range(sub):
                h = IMU_DT / sub
                p = p + v * h + 0.5 * a_w * h * h
                v = v + a_w * h
                R = R @ np.asarray(lie.so3_exp(jnp.asarray(omega_b * h, dtype=jnp.float64)))
            t += IMU_DT
        imu.append((np.full(n_sub, IMU_DT), np.array(accs), np.array(gyrs)))
        Rs.append(R.copy())
        ps.append(p.copy())
        vs.append(v.copy())
    return np.array(Rs), np.array(ps), np.array(vs), imu


def build_problem(noise_scale=1.0, init_perturb=0.05, seed=1):
    rng = np.random.default_rng(seed)
    Rs, ps, vs, imu = make_truth()

    # preintegrations: slot i integrates (i-1, i); slot 0 = identity
    preints = [pre.Preintegration.identity(jnp.float64)]
    for dts, accs, gyrs in imu:
        preints.append(
            pre.preintegrate(
                jnp.asarray(dts), jnp.asarray(accs), jnp.asarray(gyrs),
                jnp.ones(len(dts), dtype=bool),
                jnp.zeros(3, dtype=jnp.float64), jnp.zeros(3, dtype=jnp.float64),
                NOISE_GYRO, NOISE_ACC,
            )
        )
    preint = jax.tree.map(lambda *xs: jnp.stack(xs), *preints)
    cov = np.array(preint.cov)  # writable copy
    cov[0] = np.eye(9)  # unused slot
    preint_info = jnp.asarray(
        np.linalg.inv(cov + 1e-14 * np.eye(9)) * CFG.inertial_weight
    )

    pose_noise = rng.normal(size=(W, 6)) * 0.01 * noise_scale
    odom_R = np.stack(
        [Rs[i] @ np.asarray(lie.so3_exp(jnp.asarray(pose_noise[i, :3]))) for i in range(W)]
    )
    odom_p = ps + pose_noise[:, 3:]

    rel_R = np.stack([np.eye(3)] + [odom_R[i].T @ odom_R[i - 1] for i in range(1, W)])
    rel_p = np.stack(
        [np.zeros(3)] + [odom_R[i].T @ (odom_p[i - 1] - odom_p[i]) for i in range(1, W)]
    )
    info6 = np.tile(np.eye(6) * 1e4, (W, 1, 1))

    vel_meas = vs + rng.normal(size=(W, 3)) * 0.02 * noise_scale
    vel_info = np.full((W, 3), 10.0)

    world_plane = np.array([0.0, 0.0, 1.0, 0.0])
    plane_meas = np.stack(
        [
            np.asarray(
                residuals.transform_plane(
                    jnp.asarray(Rs[i]), jnp.asarray(ps[i]), jnp.asarray(world_plane)
                )
            )
            for i in range(W)
        ]
    )
    f = win.WindowFactors(
        frame_mask=jnp.ones(W, dtype=bool),
        rel_R=jnp.asarray(rel_R),
        rel_p=jnp.asarray(rel_p),
        rel_info=jnp.asarray(info6),
        prior_R=jnp.asarray(odom_R),
        prior_p=jnp.asarray(odom_p),
        prior_info=jnp.asarray(info6),
        preint=preint,
        preint_info=preint_info,
        vel_meas=jnp.asarray(vel_meas),
        vel_info=jnp.asarray(vel_info),
        plane_node=jnp.tile(jnp.asarray(world_plane), (W, 1)),
        plane_meas=jnp.asarray(plane_meas),
        plane_info=jnp.full((W,), 10.0, dtype=jnp.float64),
        plane_valid=jnp.ones(W, dtype=bool),
    )

    perturb = rng.normal(size=(W, 15)) * init_perturb
    x0 = win.WindowState(
        R=jnp.asarray(Rs) @ lie.so3_exp(jnp.asarray(perturb[:, :3])),
        p=jnp.asarray(ps + perturb[:, 3:6]),
        v=jnp.asarray(vs + perturb[:, 6:9]),
        bg=jnp.asarray(perturb[:, 9:12] * 0.01),
        ba=jnp.asarray(perturb[:, 12:15] * 0.01),
    )
    truth = win.WindowState(
        R=jnp.asarray(Rs), p=jnp.asarray(ps), v=jnp.asarray(vs),
        bg=jnp.zeros((W, 3), dtype=jnp.float64), ba=jnp.zeros((W, 3), dtype=jnp.float64),
    )
    return x0, f, truth


BIAS_INFO = (1.0 / NOISE_GYRO**2, 1.0 / NOISE_ACC**2)


def test_residuals_zero_at_truth_noiseless():
    x0, f, truth = build_problem(noise_scale=0.0)
    r, _ = win.residual_vector(truth, f, CFG, BIAS_INFO)
    # preintegration discretization leaves small residue; everything else ~ 0
    assert float(jnp.max(jnp.abs(r))) < 5.0  # whitened units
    chi2_truth = float(jnp.sum(r * r))
    r0, _ = win.residual_vector(x0, f, CFG, BIAS_INFO)
    assert chi2_truth < float(jnp.sum(r0 * r0))


def test_solver_converges_to_truth():
    x0, f, truth = build_problem(noise_scale=1.0)
    x_fin, chi2, iters = win.solve_window(x0, f, CFG, BIAS_INFO)
    # position error shrinks vs the perturbed init
    err0 = np.linalg.norm(np.asarray(x0.p) - np.asarray(truth.p), axis=1).mean()
    err1 = np.linalg.norm(np.asarray(x_fin.p) - np.asarray(truth.p), axis=1).mean()
    assert err1 < err0 * 0.5
    assert err1 < 0.03
    rot_err = [
        float(lie.rotation_angle(x_fin.R[i].T @ truth.R[i])) for i in range(W)
    ]
    assert max(rot_err) < 0.02


def test_solver_jits_and_masked_frames():
    x0, f, truth = build_problem()
    # invalidate the last two frames (partial window at startup)
    mask = jnp.asarray([True, True, True, True, False, False])
    f2 = dataclasses.replace(f, frame_mask=mask)
    solve = jax.jit(lambda a, b: win.solve_window(a, b, CFG, BIAS_INFO))
    x_fin, chi2, iters = solve(x0, f2)
    assert np.isfinite(np.asarray(x_fin.p)).all()
    # masked frames untouched by any constraint -> stay near init
    np.testing.assert_allclose(np.asarray(x_fin.p[-1]), np.asarray(x0.p[-1]), atol=1e-6)


def test_chi2_decreases():
    x0, f, truth = build_problem()
    r0, _ = win.residual_vector(x0, f, CFG, BIAS_INFO)
    x_fin, chi2, _ = win.solve_window(x0, f, CFG, BIAS_INFO)
    assert float(chi2) < float(jnp.sum(r0 * r0))


def test_schur_solve_matches_dense():
    """Schur elimination of velocity/bias blocks gives the same LM solution
    as the full dense solve."""
    x0, f, truth = build_problem()
    x_dense, chi2_d, _ = win.solve_window(x0, f, CFG, BIAS_INFO)
    x_schur, chi2_s, _ = win.solve_window(x0, f, CFG, BIAS_INFO, use_schur=True)
    np.testing.assert_allclose(np.asarray(x_schur.p), np.asarray(x_dense.p), atol=1e-8)
    np.testing.assert_allclose(np.asarray(x_schur.v), np.asarray(x_dense.v), atol=1e-8)
    np.testing.assert_allclose(float(chi2_s), float(chi2_d), rtol=1e-8)


def test_gn_optimizer_matches_lm():
    """BackendConfig.optimizer='GN' (no inner lambda search) must land on
    the same optimum as LM on a warm, healthy window — the deployment mode
    trade documented in BENCHMARKS.md 'Sequential odometry'."""
    import dataclasses as _dc

    x0, f, truth = build_problem(noise_scale=1.0)
    cfg_gn = _dc.replace(CFG, optimizer="GN")
    x_lm, chi2_lm, _ = win.solve_window(x0, f, CFG, BIAS_INFO)
    x_gn, chi2_gn, iters_gn = win.solve_window(x0, f, cfg_gn, BIAS_INFO)
    np.testing.assert_allclose(float(chi2_gn), float(chi2_lm), rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(x_gn.p), np.asarray(x_lm.p), atol=1e-3
    )
    err_gn = np.linalg.norm(np.asarray(x_gn.p) - np.asarray(truth.p), axis=1).mean()
    assert err_gn < 0.03
    # GN with schur elimination agrees too
    x_gs, chi2_gs, _ = win.solve_window(x0, f, cfg_gn, BIAS_INFO, use_schur=True)
    np.testing.assert_allclose(float(chi2_gs), float(chi2_gn), rtol=1e-6)


def test_gn_survives_rejected_first_step():
    """A cold window whose first undamped GN step overshoots must escalate
    damping and keep optimizing - not return the unoptimized init."""
    import dataclasses as _dc

    x0, f, truth = build_problem(noise_scale=1.0, init_perturb=0.5, seed=4)
    cfg_gn = _dc.replace(CFG, optimizer="GN")
    x_gn, chi2_gn, iters = win.solve_window(x0, f, cfg_gn, BIAS_INFO)
    r0, _ = win.residual_vector(x0, f, CFG, BIAS_INFO)
    chi2_init = float(jnp.sum(r0 * r0))
    assert float(chi2_gn) < 0.5 * chi2_init
    err0 = np.linalg.norm(np.asarray(x0.p) - np.asarray(truth.p), axis=1).mean()
    err1 = np.linalg.norm(np.asarray(x_gn.p) - np.asarray(truth.p), axis=1).mean()
    assert err1 < 0.5 * err0


def test_block_linearization_matches_dense_jacfwd():
    """linearize_blocks (per-slot [33,30] Jacobians, block-tridiagonal H)
    must equal the round-2 dense path (jacfwd over the full W*15 retraction
    of residual_vector) exactly — same residuals, same frozen IRLS weights,
    just block-structured differentiation. f64, atol 1e-9."""
    x0, f, _ = build_problem()
    _, kw = win.residual_vector(x0, f, CFG, BIAS_INFO)

    def r_of_delta(d):
        r, _ = win.residual_vector(
            win.retract(x0, d.reshape(W, 15)), f, CFG, BIAS_INFO, kw
        )
        return r

    d0 = jnp.zeros(W * 15, dtype=jnp.float64)
    r0 = r_of_delta(d0)
    J = jax.jacfwd(r_of_delta)(d0)
    H_dense = J.T @ J
    g_dense = J.T @ r0

    H_blk, g_blk, chi2_blk = win.linearize_blocks(x0, f, CFG, BIAS_INFO, kw)
    np.testing.assert_allclose(np.asarray(H_blk), np.asarray(H_dense), atol=1e-9)
    np.testing.assert_allclose(np.asarray(g_blk), np.asarray(g_dense), atol=1e-9)
    np.testing.assert_allclose(float(chi2_blk), float(jnp.sum(r0 * r0)), rtol=1e-12)
