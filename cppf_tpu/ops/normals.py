"""KNN-PCA surface-normal estimation, fully on-TPU.

Replaces Open3D's C++ ``estimate_normals(KDTreeSearchParamKNN(knn))``
(reference ``utils/util.py:61-65``, ``utils/dataset.py:224-227``): for each
point, the normal is the eigenvector of the k-neighbourhood covariance with
the smallest eigenvalue.

The 3x3 symmetric eigenproblem is solved in closed form (trigonometric
eigenvalues + cross-product eigenvector), which vectorises over all points —
no batched LAPACK call.  Normal *sign* is arbitrary in the reference (Open3D
leaves PCA sign indeterminate; every downstream consumer canonicalises
against the pair axis, e.g. reference ``utils/dataset.py:54-55``,
``nocs/inference.py:291-292``).  We fix a deterministic sign (positive
component sum) for reproducibility.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cppf_tpu.ops.knn import knn_indices


def _smallest_eigvec_3x3(C: jnp.ndarray) -> jnp.ndarray:
    """Eigenvector for the smallest eigenvalue of symmetric C [..., 3, 3]."""
    # eigenvalues via the trigonometric solution for symmetric 3x3
    q = jnp.trace(C, axis1=-2, axis2=-1) / 3.0
    B = C - q[..., None, None] * jnp.eye(3, dtype=C.dtype)
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    detB = jnp.linalg.det(B)
    r = jnp.clip(detB / (2.0 * p**3), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    # eig3 <= eig2 <= eig1
    eig_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)

    A = C - eig_min[..., None, None] * jnp.eye(3, dtype=C.dtype)
    # the null space of A is the eigenvector; take the largest cross product
    # of row pairs for numerical robustness
    r0, r1, r2 = A[..., 0, :], A[..., 1, :], A[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c12 = jnp.cross(r1, r2)
    c20 = jnp.cross(r2, r0)
    n01 = jnp.sum(c01 * c01, -1)
    n12 = jnp.sum(c12 * c12, -1)
    n20 = jnp.sum(c20 * c20, -1)
    best = jnp.argmax(jnp.stack([n01, n12, n20], -1), -1)
    vec = jnp.take_along_axis(
        jnp.stack([c01, c12, c20], -2), best[..., None, None], -2
    )[..., 0, :]
    norm = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    # degenerate neighbourhood (isotropic / planar-ambiguous): fall back to +z
    fallback = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], C.dtype), vec.shape)
    vec = jnp.where(norm > 1e-12, vec / (norm + 1e-30), fallback)
    return vec


@partial(jax.jit, static_argnames=("knn",))
def estimate_normals(
    pc: jnp.ndarray,
    knn: int = 60,
    valid_mask: jnp.ndarray | None = None,
    nbr_idx: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Per-point unit normals [N, 3] from k-NN PCA.

    ``nbr_idx`` may be supplied to reuse a previously computed neighbourhood.
    """
    if nbr_idx is None:
        nbr_idx = knn_indices(pc, knn, valid_mask)
    nbrs = pc[nbr_idx]                      # [N, k, 3]
    mean = jnp.mean(nbrs, -2, keepdims=True)
    centred = nbrs - mean
    cov = jnp.einsum("nki,nkj->nij", centred, centred) / nbrs.shape[-2]
    n = _smallest_eigvec_3x3(cov)
    # deterministic sign: positive component sum (ties broken toward +z)
    s = jnp.sum(n, -1) + 1e-9 * n[..., 2]
    n = n * jnp.where(s < 0, -1.0, 1.0)[..., None]
    return n
