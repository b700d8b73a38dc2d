"""Soft-binning codec: scalar <-> two-hot probability over bins.

Behavioural parity target: reference ``utils/util.py:121-178``
(``real2prob`` / ``prob2real``, linear two-hot interpolation with an optional
circular variant).  Implemented as pure JAX; works under jit/vmap.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def real2prob(val: jnp.ndarray, max_val: float, num_bins: int, circular: bool = False) -> jnp.ndarray:
    """Encode scalars in [0, max_val] as a two-hot distribution over bins.

    Non-circular: bin centres at i * max_val/(num_bins-1); mass is split
    linearly between the two bracketing bins.  Circular: bins tile the circle
    with centres offset by half an interval; mass wraps around.
    """
    val = jnp.asarray(val)
    if not circular:
        interval = max_val / (num_bins - 1)
        t = val / interval
        low = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, num_bins - 2)
        w_low = 1.0 - (t - low)
        w_high = 1.0 - w_low
        return (
            jax.nn.one_hot(low, num_bins, dtype=val.dtype) * w_low[..., None]
            + jax.nn.one_hot(low + 1, num_bins, dtype=val.dtype) * w_high[..., None]
        )
    interval = max_val / num_bins
    val_new = jnp.where(val < interval / 2, val + max_val, val)
    res = real2prob(val_new - interval / 2, max_val, num_bins + 1, circular=False)
    res = res.at[..., 0].add(res[..., -1])
    return res[..., :-1]


def prob2real(prob: jnp.ndarray, max_val: float, num_bins: int, circular: bool = False) -> jnp.ndarray:
    """Decode a distribution over bins back to its expected scalar."""
    prob = jnp.asarray(prob)
    if not circular:
        centres = jnp.arange(num_bins, dtype=prob.dtype) * (max_val / (num_bins - 1))
        return jnp.sum(prob * centres, -1)
    interval = max_val / num_bins
    ang = jnp.arange(num_bins, dtype=prob.dtype) * interval + interval / 2
    vec = jnp.sum(prob[..., None] * jnp.stack([jnp.cos(ang), jnp.sin(ang)], -1), -2)
    res = jnp.arctan2(vec[..., 1], vec[..., 0])
    return jnp.where(res < 0, res + 2 * jnp.pi, res)


def decode_bin_sample(rng: jax.Array, logits: jnp.ndarray, max_val: float, lo: float = 0.0) -> jnp.ndarray:
    """Multinomial bin decode used at inference (reference nocs/inference.py:185-188).

    Samples a bin index from softmax(logits) per row and maps it to
    ``lo + idx/(num_bins-1) * (max_val - lo)``.
    """
    num_bins = logits.shape[-1]
    idx = jax.random.categorical(rng, logits, axis=-1)
    return lo + idx.astype(logits.dtype) / (num_bins - 1) * (max_val - lo)


def decode_bin_argmax(logits: jnp.ndarray, max_val: float, lo: float = 0.0) -> jnp.ndarray:
    """Deterministic (argmax) variant of :func:`decode_bin_sample`."""
    num_bins = logits.shape[-1]
    idx = jnp.argmax(logits, axis=-1)
    return lo + idx.astype(logits.dtype) / (num_bins - 1) * (max_val - lo)
