"""Edge information matrices from registration quality.

Parity with reference InformationMatrixCalculator
(src/radar_graph_slam/information_matrix_calculator.cpp:29-86 + hpp:39-42):
fitness = mean NN squared distance between the clouds under the relative
pose; an exponential gain maps fitness to a variance in [min, max]; the 6x6
information is diag(1/w_x, 1/w_q) including the reference's 1e-8 scaling
quirk. The kd-tree fitness loop becomes one masked NN distance-matrix pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rivslam_tpu.core import lie
from rivslam_tpu.core.config import BackendConfig
from rivslam_tpu.ops import knn


def fitness_score(
    xyz1: jax.Array,
    mask1: jax.Array,
    xyz2: jax.Array,
    mask2: jax.Array,
    relpose: jax.Array,
    max_range: float = jnp.inf,
) -> jax.Array:
    """Mean squared NN distance of cloud2 (transformed by relpose) against
    cloud1 (information_matrix_calculator.cpp:55-86)."""
    from rivslam_tpu.core.pointcloud import SENTINEL

    moved = lie.transform_points(relpose, xyz2)
    ref = jnp.where(mask1[..., None], xyz1, SENTINEL)
    _, d2 = knn.nearest_neighbor(moved, ref, mask1)
    ok = mask2 & (d2 <= max_range)
    nr = jnp.sum(ok)
    score = jnp.sum(jnp.where(ok, d2, 0.0)) / jnp.maximum(nr, 1)
    return jnp.where(nr > 0, score, jnp.finfo(xyz1.dtype).max)


def _weight(a, max_x, min_y, max_y, x):
    """hpp:39-42."""
    y = (1.0 - jnp.exp(-a * x)) / (1.0 - jnp.exp(-a * max_x))
    return min_y + (max_y - min_y) * y


def information_from_fitness(fitness: jax.Array, cfg: BackendConfig, dtype=None) -> jax.Array:
    """6x6 information: diag blocks 1/w_x (trans) and 1/w_q (rot), with the
    reference's 1e-8 scaling (information_matrix_calculator.cpp:44-49)."""
    dtype = dtype or fitness.dtype
    if cfg.use_const_inf_matrix:
        inf = jnp.eye(6, dtype=dtype)
        inf = inf.at[:3, :3].divide(cfg.const_stddev_x)
        inf = inf.at[3:, 3:].divide(cfg.const_stddev_q)
        return inf
    fitness_thresh = 0.5  # cpp ctor default "fitness_score_thresh"
    w_x = 1.0e-8 * _weight(
        cfg.var_gain_a, fitness_thresh, cfg.min_stddev_x**2, cfg.max_stddev_x**2, fitness
    )
    w_q = 1.0e-8 * _weight(
        cfg.var_gain_a, fitness_thresh, cfg.min_stddev_q**2, cfg.max_stddev_q**2, fitness
    )
    inf = jnp.eye(6, dtype=dtype)
    inf = inf.at[:3, :3].multiply(1.0 / w_x)
    inf = inf.at[3:, 3:].multiply(1.0 / w_q)
    return inf


def calc_information_matrix(
    xyz1, mask1, xyz2, mask2, relpose, cfg: BackendConfig, scaled: bool = True
) -> jax.Array:
    """calc_information_matrix parity. NOTE the reference builds info with
    translation in the TOP-LEFT block; our residual order is (rot, trans), so
    we swap blocks here to keep physical meaning identical.

    `scaled=False` drops the reference's 1e-8 variance-scaling quirk
    (information_matrix_calculator.cpp:44-45) and yields PHYSICAL variances.
    The window solve keeps the scaled version (it ran live in the reference);
    the global loop graph uses physical ones — with the scaled values every
    edge's chi2 is ~1e8 and the Huber kernel crushes precisely the loop
    closures, which went unnoticed upstream because the loop timer was
    disabled (SURVEY.md §3.3)."""
    if cfg.use_const_inf_matrix:
        inf = jnp.eye(6, dtype=xyz1.dtype)
        inf = inf.at[3:, 3:].divide(cfg.const_stddev_x)  # trans
        inf = inf.at[:3, :3].divide(cfg.const_stddev_q)  # rot
        return inf
    f = fitness_score(xyz1, mask1, xyz2, mask2, relpose, cfg.fitness_score_max_range)
    fitness_thresh = 0.5
    quirk = 1.0e-8 if scaled else 1.0
    w_x = quirk * _weight(
        cfg.var_gain_a, fitness_thresh, cfg.min_stddev_x**2, cfg.max_stddev_x**2, f
    )
    w_q = quirk * _weight(
        cfg.var_gain_a, fitness_thresh, cfg.min_stddev_q**2, cfg.max_stddev_q**2, f
    )
    inf = jnp.eye(6, dtype=xyz1.dtype)
    inf = inf.at[3:, 3:].multiply(1.0 / w_x)  # translation rows (our order)
    inf = inf.at[:3, :3].multiply(1.0 / w_q)  # rotation rows
    return inf
