import jax.numpy as jnp
import numpy as np

from rivslam_tpu.ops import eig3


def random_psd(rng, n=200, scale=1.0):
    A = rng.normal(size=(n, 3, 3)) * scale
    return A @ np.swapaxes(A, 1, 2)


def test_eigenvalues_match_numpy(rng):
    C = random_psd(rng)
    vals = np.asarray(eig3.eigenvalues_sym3(jnp.asarray(C)))
    ref = np.linalg.eigvalsh(C)
    np.testing.assert_allclose(vals, ref, rtol=1e-8, atol=1e-9)


def test_smallest_eigenvector(rng):
    C = random_psd(rng)
    v = np.asarray(eig3.smallest_eigenvector_sym3(jnp.asarray(C)))
    vals = np.linalg.eigvalsh(C)
    # Rayleigh quotient equals smallest eigenvalue
    rq = np.einsum("ni,nij,nj->n", v, C, v)
    np.testing.assert_allclose(rq, vals[:, 0], rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-12)


def test_plane_regularize_matches_eigh(rng):
    C = random_psd(rng)
    reg = np.asarray(eig3.plane_regularize(jnp.asarray(C), 1e-3))
    vals, vecs = np.linalg.eigh(C)
    ref = np.stack([
        vecs[i] @ np.diag([1e-3, 1.0, 1.0]) @ vecs[i].T for i in range(len(C))
    ])
    np.testing.assert_allclose(reg, ref, atol=1e-6)
    # result has eigenvalues exactly {1e-3, 1, 1}
    out_vals = np.linalg.eigvalsh(reg)
    np.testing.assert_allclose(out_vals[:, 0], 1e-3, atol=1e-7)
    np.testing.assert_allclose(out_vals[:, 1:], 1.0, atol=1e-7)


def test_degenerate_isotropic():
    C = jnp.broadcast_to(jnp.eye(3) * 2.0, (4, 3, 3))
    vals = np.asarray(eig3.eigenvalues_sym3(C))
    np.testing.assert_allclose(vals, 2.0, atol=1e-9)
    v = np.asarray(eig3.smallest_eigenvector_sym3(C))
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0)
    reg = np.asarray(eig3.plane_regularize(C))
    out_vals = np.linalg.eigvalsh(reg)
    np.testing.assert_allclose(out_vals[:, 0], 1e-3, atol=1e-8)


def test_degenerate_planar(rng):
    # rank-2: two large equal, one zero eigenvalue
    for _ in range(5):
        Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        C = Q @ np.diag([4.0, 4.0, 0.0]) @ Q.T
        v = np.asarray(eig3.smallest_eigenvector_sym3(jnp.asarray(C[None])))[0]
        # v spans the null space
        np.testing.assert_allclose(C @ v, 0.0, atol=1e-7)
