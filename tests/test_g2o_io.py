"""g2o text-format export/import (io/g2o_io.py) — DumpGraph interop parity
(graph_slam.cpp:512-538 save/load; robust_kernel_io.cpp sidecar)."""

import numpy as np
import jax.numpy as jnp

from rivslam_tpu.io import g2o_io
from rivslam_tpu.loop import global_graph

from test_compact import _chain_graph


def test_quat_roundtrip(rng):
    for _ in range(20):
        w = 0.8 * rng.standard_normal(3)
        from rivslam_tpu.core import lie

        R = np.asarray(lie.so3_exp(jnp.asarray(w)))
        q = g2o_io._rot_to_quat(R)
        np.testing.assert_allclose(g2o_io._quat_to_rot(q), R, atol=1e-12)


def test_info_permutation_roundtrip(rng):
    A = rng.standard_normal((6, 6))
    info = A @ A.T
    vals = g2o_io._info_out(info)
    assert vals.shape == (21,)
    np.testing.assert_allclose(g2o_io._info_in(vals), info, atol=1e-12)


def test_export_import_roundtrip(rng, tmp_path):
    n = 10
    g, rels, poses = _chain_graph(rng, n=n)
    # non-trivial informations
    import dataclasses

    A = rng.standard_normal((n, 6, 6))
    oinfo = np.einsum("kij,klj->kil", A, A) + 6 * np.eye(6)
    g = dataclasses.replace(g, odom_info=g.odom_info.at[:n].set(jnp.asarray(oinfo)))
    path = str(tmp_path / "graph.g2o")
    n_out = g2o_io.export_g2o(g, path)
    assert n_out == n

    g2 = g2o_io.import_g2o(path, dtype=jnp.float64)
    assert int(np.asarray(g2.node_mask).sum()) == n
    np.testing.assert_allclose(np.asarray(g2.R[:n]), np.asarray(g.R[:n]), atol=1e-8)
    np.testing.assert_allclose(np.asarray(g2.p[:n]), np.asarray(g.p[:n]), atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(g2.odom_rel_R[1:n]), np.asarray(g.odom_rel_R[1:n]), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(g2.odom_info[1:n]), np.asarray(g.odom_info[1:n]), atol=1e-5
    )
    # the single loop edge survives with endpoints + measurement
    assert bool(g2.loop_mask[0]) and int(g2.loop_i[0]) == 2 and int(g2.loop_j[0]) == 7
    np.testing.assert_allclose(
        np.asarray(g2.loop_rel_p[0]), np.asarray(g.loop_rel_p[0]), atol=1e-8
    )
    # kernel sidecar: one Huber line for the loop edge, indexed after the
    # n-1 odometry edges
    lines = open(path + ".kernels").read().split()
    assert lines[0] == str(n - 1) and lines[1] == "Huber"


def test_imported_graph_solves_like_original(rng, tmp_path):
    n = 10
    g, rels, poses = _chain_graph(rng, n=n)
    path = str(tmp_path / "graph.g2o")
    g2o_io.export_g2o(g, path)
    g2 = g2o_io.import_g2o(path, keyframe_capacity=16, loop_capacity=4, dtype=jnp.float64)
    a, chi_a = global_graph.solve_pose_graph(g, gn_iters=4, cg_iters=32)
    b, chi_b = global_graph.solve_pose_graph(g2, gn_iters=4, cg_iters=32)
    np.testing.assert_allclose(
        np.asarray(b.p[:n]), np.asarray(a.p[:n]), atol=1e-6
    )
    np.testing.assert_allclose(float(chi_b), float(chi_a), rtol=1e-6, atol=1e-9)


def test_file_is_standard_g2o(rng, tmp_path):
    g, _, _ = _chain_graph(rng, n=8)
    path = str(tmp_path / "graph.g2o")
    g2o_io.export_g2o(g, path)
    lines = open(path).read().strip().splitlines()
    assert sum(l.startswith("VERTEX_SE3:QUAT ") for l in lines) == 8
    assert "FIX 0" in lines
    edges = [l for l in lines if l.startswith("EDGE_SE3:QUAT ")]
    assert len(edges) == 7 + 1  # chain + loop
    # 2 ids + 7 measurement + 21 information fields
    assert all(len(l.split()) == 1 + 2 + 7 + 21 for l in edges)
