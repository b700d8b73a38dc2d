import numpy as np
import jax.numpy as jnp
import torch

from cppf_tpu.core.binning import prob2real, real2prob


def _torch_real2prob(val, max_val, num_bins, circular=False):
    """Reference semantics (utils/util.py:121-157) via torch for oracle."""
    val = torch.as_tensor(val, dtype=torch.float64)
    res = torch.zeros((*val.shape, num_bins), dtype=val.dtype)
    if not circular:
        interval = max_val / (num_bins - 1)
        low = torch.clamp(torch.floor(val / interval).long(), max=num_bins - 2)
        high = low + 1
        res.scatter_(-1, low[..., None], torch.unsqueeze(1.0 - (val / interval - low), -1))
        res.scatter_(-1, high[..., None], 1.0 - torch.gather(res, -1, low[..., None]))
        return res
    interval = max_val / num_bins
    val_new = val.clone()
    val_new[val < interval / 2] += max_val
    res = _torch_real2prob(val_new - interval / 2, max_val, num_bins + 1)
    res[..., 0] += res[..., -1]
    return res[..., :-1]


def test_real2prob_matches_reference_semantics(rng):
    vals = rng.uniform(0, 0.24, size=(1000,))
    ours = np.asarray(real2prob(jnp.array(vals), 0.24, 32))
    ref = _torch_real2prob(vals, 0.24, 32).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_real2prob_circular_matches_reference_semantics(rng):
    vals = rng.uniform(0, 2 * np.pi, size=(500,))
    ours = np.asarray(real2prob(jnp.array(vals), 2 * np.pi, 36, circular=True))
    ref = _torch_real2prob(vals, 2 * np.pi, 36, circular=True).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_roundtrip_linear(rng):
    vals = rng.uniform(0, 1.0, size=(200,))
    prob = real2prob(jnp.array(vals), 1.0, 32)
    back = prob2real(prob, 1.0, 32)
    np.testing.assert_allclose(np.asarray(back), vals, atol=1e-5)


def test_roundtrip_circular(rng):
    vals = rng.uniform(0.05, 2 * np.pi - 0.05, size=(200,))
    prob = real2prob(jnp.array(vals), 2 * np.pi, 36, circular=True)
    back = prob2real(prob, 2 * np.pi, 36, circular=True)
    np.testing.assert_allclose(np.asarray(back), vals, atol=1e-4)


def test_distribution_sums_to_one(rng):
    vals = rng.uniform(0, np.pi, size=(100,))
    prob = np.asarray(real2prob(jnp.array(vals), np.pi, 36))
    np.testing.assert_allclose(prob.sum(-1), 1.0, atol=1e-6)
    assert np.all(prob >= 0)
