"""Pallas kernel tests (interpret mode on CPU; compiled path runs on TPU)."""
import numpy as np
import jax.numpy as jnp

from cppf_tpu.core.geometry import fibonacci_sphere
from cppf_tpu.ops.pallas.sphere_count import sphere_bin_count_pallas
from cppf_tpu.ops.voting import sphere_bin_count


def test_sphere_count_pallas_matches_xla(rng):
    cands = rng.normal(size=(5000, 3)).astype(np.float32)
    cands /= np.linalg.norm(cands, axis=-1, keepdims=True)
    cands[4096:] = 0.0  # padding-style zero rows never count
    sphere = fibonacci_sphere(479).astype(np.float32)
    tol = np.cos(np.deg2rad(5.0))
    ref = np.asarray(sphere_bin_count(jnp.asarray(cands), jnp.asarray(sphere), tol, chunk=1024))
    got = np.asarray(sphere_bin_count_pallas(
        jnp.asarray(cands), jnp.asarray(sphere), tol, block=1024, interpret=True))
    np.testing.assert_array_equal(got, ref)
