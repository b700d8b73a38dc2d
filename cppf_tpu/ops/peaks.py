"""Vote-grid peak utilities.

- :func:`peak_contrast` is a *fixed* re-design of the reference's dead
  ``findpeak`` kernel (reference models/voting.py:150-172 — never called and
  syntactically broken upstream): 6-neighbour contrast score per voxel.
- :func:`gaussian_blur3d` + :func:`extract_peaks` implement the zero-shot
  notebook's multi-peak proposal extraction with suppression
  (reference nocs/zero_shot.ipynb cell 9): iteratively take the global
  argmax of the smoothed grid, record it if its score clears a boundary
  contrast threshold, and suppress a ball around it.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _shift(grid: jnp.ndarray, delta: int, axis: int) -> jnp.ndarray:
    """Shift by ``delta`` along ``axis`` with index clamping at the borders."""
    idx = jnp.clip(jnp.arange(grid.shape[axis]) - delta, 0, grid.shape[axis] - 1)
    return jnp.take(grid, idx, axis)


def peak_contrast(grid: jnp.ndarray, width: int = 1) -> jnp.ndarray:
    """6-neighbour contrast: Σ_axis (2·g − g[+w] − g[−w]) with clamped borders."""
    out = jnp.zeros_like(grid)
    for axis in range(3):
        fwd = _shift(grid, -width, axis)
        bwd = _shift(grid, width, axis)
        out = out + (grid - fwd) + (grid - bwd)
    return out


def gaussian_blur3d(grid: jnp.ndarray, sigma: float, radius: int | None = None) -> jnp.ndarray:
    """Separable 3D gaussian smoothing via three 1D convolutions."""
    if radius is None:
        radius = max(1, int(3.0 * sigma + 0.5))
    x = jnp.arange(-radius, radius + 1, dtype=grid.dtype)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)
    out = grid
    for axis in range(3):
        moved = jnp.moveaxis(out, axis, -1)
        shape = moved.shape
        flat = moved.reshape(1, -1, shape[-1])
        conv = lax.conv_general_dilated(
            flat[:, :, :, None].transpose(0, 3, 1, 2),  # NCHW with H=rows
            k[None, None, None, :],                      # OIHW 1x1x1xK
            (1, 1),
            [(0, 0), (radius, radius)],
        )
        out = jnp.moveaxis(conv[0, 0].reshape(shape), -1, axis)
    return out


@partial(jax.jit, static_argnames=("max_peaks", "suppress_radius"))
def extract_peaks(
    grid: jnp.ndarray,
    max_peaks: int = 8,
    suppress_radius: int = 5,
    min_contrast: float = 0.0,
):
    """Iterative argmax + ball suppression.

    Returns (coords [max_peaks, 3] int32, scores [max_peaks], valid mask).
    A peak is valid if its (pre-suppression) score exceeds ``min_contrast``
    times the mean boundary value of its suppression ball.
    """
    gx, gy, gz = grid.shape
    xs = jnp.arange(gx)[:, None, None]
    ys = jnp.arange(gy)[None, :, None]
    zs = jnp.arange(gz)[None, None, :]

    def body(carry, _):
        g = carry
        flat = jnp.argmax(g)
        ix = flat // (gy * gz)
        iy = (flat % (gy * gz)) // gz
        iz = flat % gz
        score = g.reshape(-1)[flat]
        dist2 = (xs - ix) ** 2 + (ys - iy) ** 2 + (zs - iz) ** 2
        ball = dist2 <= suppress_radius**2
        shell = jnp.logical_and(dist2 > suppress_radius**2, dist2 <= (suppress_radius + 1) ** 2)
        boundary = jnp.sum(jnp.where(shell, g, 0.0)) / jnp.maximum(jnp.sum(shell), 1)
        ok = score > boundary * (1.0 + min_contrast)
        g = jnp.where(ball, 0.0, g)
        return g, (jnp.stack([ix, iy, iz]).astype(jnp.int32), score, ok)

    _, (coords, scores, ok) = lax.scan(body, grid, None, length=max_peaks)
    return coords, scores, ok
