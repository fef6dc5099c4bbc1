"""Controlled APDGICP-vs-GICP noise-model study (VERDICT round-1 item #1).

The round-1 validation course added isotropic *Cartesian* noise to synthetic
scans — exactly the noise model plain GICP implicitly assumes — and
FAST_APDGICP scored 5x worse ATE than FAST_GICP on it. But the adaptive
probability-distribution covariance (fast_apdgicp_impl.hpp:163-184) models
*spherical radar measurement* noise: sigma_r = d*dist_var/400 (radial),
sigma_tan ~ d*sin(az/el var) (tangential, growing with range). Under
Cartesian noise the adaptive term claims ~d*sin(1 deg) (~0.5 m at 30 m) of
tangential variance that does not exist, crushing the rotation-constraining
tangential residuals — it can only lose there.

This module runs the controlled experiment: pairwise registration over many
trials under (a) the legacy Cartesian model and (b) the radar-realistic
spherical model with *matched* parameters (range_noise_rel = dist_var/400,
angular sigmas = azimuth/elevation_var), using the launch-file runtime
parameters (launch/radar_graph_slam.launch:34-36: dist_var=0.86,
az=el=1.0 deg). Output feeds BENCHMARKS.md.

Run: python -m rivslam_tpu.eval.noise_study [--trials 20]
"""

from __future__ import annotations

import argparse
import json

import numpy as np

# jax / engine imports are deferred into the functions so `--cpu` can flip
# the platform before anything initializes the pre-pinned axon TPU backend
# (same defect + fix as eval/validation.py, round 5; the config import is
# backend-safe)
from rivslam_tpu.core.config import RegistrationConfig


def pose_error(T_est: np.ndarray, T_true: np.ndarray) -> tuple[float, float]:
    # f64 host math: f32 arccos quantizes sub-0.05deg rotation errors to 0
    delta = np.linalg.inv(np.asarray(T_est, np.float64)) @ np.asarray(T_true, np.float64)
    dt = float(np.linalg.norm(delta[:3, 3]))
    cosang = np.clip((np.trace(delta[:3, :3]) - 1.0) * 0.5, -1.0, 1.0)
    dr = float(np.degrees(np.arccos(cosang)))
    return dt, dr


def run_trials(
    n_trials: int,
    noise_model: str,
    cfg_apd: RegistrationConfig,
    cfg_gicp: RegistrationConfig,
    capacity: int = 1024,
    fov_deg: float = 56.5,
    seed: int = 0,
    cartesian_noise: float = 0.02,
) -> dict:
    """Register n_trials independent scan pairs under the given noise model;
    return per-method translation/rotation error statistics."""
    import jax
    import jax.numpy as jnp

    from rivslam_tpu.core import lie
    from rivslam_tpu.frontend import apdgicp
    from rivslam_tpu.io import synthetic

    # build all trial pairs on the host, then register each method's whole
    # batch in ONE jitted vmapped dispatch (per-trial eager dispatch over the
    # axon tunnel is ~100x slower)
    sxs, sms, txs, tms, rels = [], [], [], [], []
    for trial in range(n_trials):
        rng = np.random.default_rng(seed + trial)
        world = synthetic.make_world(rng, n_points=8000)
        T0 = np.eye(4)
        T0[:3, 3] = [rng.uniform(-5, 5), rng.uniform(-5, 5), 2.0]
        xi = np.concatenate(
            [rng.uniform(-0.02, 0.02, 3), rng.uniform(-0.4, 0.4, 3)]
        )
        T_rel = np.asarray(lie.se3_exp(jnp.asarray(xi)))
        T1 = T0 @ T_rel
        # f32 = production dtype; the study isolates the covariance-model
        # effect, not numerics (errors here are ~1e-1 m, far above f32 eps)
        kw: dict = dict(capacity=capacity, fov_deg=fov_deg, dtype=jnp.float32)
        if noise_model == "cartesian":
            kw["noise"] = cartesian_noise
        elif noise_model == "spherical":
            # generative model matched to the launch-file adaptive params
            kw.update(
                noise=0.0,
                range_noise_rel=cfg_apd.dist_var / 400.0,
                az_noise_deg=cfg_apd.azimuth_var,
                el_noise_deg=cfg_apd.elevation_var,
            )
        else:
            raise ValueError(noise_model)
        target = synthetic.observe(world, T0, rng, **kw)
        source = synthetic.observe(world, T1, rng, **kw)
        sxs.append(source.xyz); sms.append(source.mask)
        txs.append(target.xyz); tms.append(target.mask)
        rels.append(T_rel)
    sx, sm = jnp.stack(sxs), jnp.stack(sms)
    tx, tm = jnp.stack(txs), jnp.stack(tms)
    eye = jnp.stack([jnp.eye(4, dtype=jnp.float32)] * n_trials)

    errs: dict[str, list[tuple[float, float]]] = {}
    for name, cfg in (("FAST_APDGICP", cfg_apd), ("FAST_GICP", cfg_gicp)):
        batched = jax.jit(
            jax.vmap(
                lambda a, b, c, d, g: apdgicp.prepare_and_register(
                    a, b, c, d, g, cfg
                ).T
            )
        )
        Ts = np.asarray(batched(sx, sm, tx, tm, eye))
        errs[name] = [pose_error(Ts[i], rels[i]) for i in range(n_trials)]
    out = {"noise_model": noise_model, "trials": n_trials}
    for name, es in errs.items():
        dts = np.array([e[0] for e in es])
        drs = np.array([e[1] for e in es])
        out[name] = {
            "trans_rmse_m": float(np.sqrt(np.mean(dts**2))),
            "trans_median_m": float(np.median(dts)),
            "rot_rmse_deg": float(np.sqrt(np.mean(drs**2))),
            "rot_median_deg": float(np.median(drs)),
        }
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=20)
    ap.add_argument("--capacity", type=int, default=1024)
    ap.add_argument("--sweep", action="store_true", help="also sweep az/el var")
    ap.add_argument("--cpu", action="store_true", help="run on host CPU")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    # launch-file runtime params (radar_graph_slam.launch:34-36)
    cfg_apd = RegistrationConfig(method="FAST_APDGICP", transformation_epsilon=5e-4)
    cfg_gicp = RegistrationConfig(method="FAST_GICP", transformation_epsilon=5e-4)

    for model in ("cartesian", "spherical"):
        r = run_trials(args.trials, model, cfg_apd, cfg_gicp, capacity=args.capacity)
        print(json.dumps(r))

    if args.sweep:
        for var in (0.25, 0.5, 1.0, 2.0):
            cfg = RegistrationConfig(
                method="FAST_APDGICP", transformation_epsilon=5e-4,
                azimuth_var=var, elevation_var=var,
            )
            r = run_trials(args.trials, "spherical", cfg, cfg_gicp,
                           capacity=args.capacity)
            r["az_el_var_deg"] = var
            print(json.dumps(r))


if __name__ == "__main__":
    main()
