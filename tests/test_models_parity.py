"""Numerical parity: our flax encoders vs the reference torch modules.

The reference models (models/model.py, models/sprin.py) import only torch,
so we can instantiate them directly from /root/reference (read-only) and
compare outputs on identical inputs + converted weights.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference")

from cppf_tpu.models.convert import point_encoder_from_torch, ppf_encoder_from_torch
from cppf_tpu.models.encoders import PointEncoder, PPFEncoder
from cppf_tpu.ops.knn import knn_indices

ref_models = pytest.importorskip("models.model")


def _make_inputs(rng, n=128):
    pc = rng.normal(size=(n, 3)).astype(np.float32) * 0.1
    normals = rng.normal(size=(n, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    return pc, normals


def test_point_encoder_matches_reference(rng):
    pc, normals = _make_inputs(rng)
    k = 16
    torch_enc = ref_models.PointEncoder(k=k, spfcs=[32, 64, 32, 32], num_layers=1, out_dim=32).eval()
    with torch.no_grad():
        dist = torch.cdist(torch.from_numpy(pc[None]), torch.from_numpy(pc[None]))
        ref_out = torch_enc(
            torch.from_numpy(pc[None]), torch.from_numpy(normals[None]), dist
        )[0].numpy()

    sd = {kk: v.detach().numpy() for kk, v in torch_enc.state_dict().items()}
    params = point_encoder_from_torch(sd, num_layers=1)
    enc = PointEncoder(spfcs=(32, 64, 32, 32), out_dim=32, num_layers=1)
    nbr = knn_indices(jnp.array(pc), k, chunk=64)
    ours = np.asarray(enc.apply(params, jnp.array(pc), jnp.array(normals), nbr))
    np.testing.assert_allclose(ours, ref_out, atol=1e-3)


def test_ppf_encoder_matches_reference(rng):
    pc, normals = _make_inputs(rng)
    feat = rng.normal(size=(128, 40)).astype(np.float32)
    idxs = rng.integers(0, 128, size=(1000, 2)).astype(np.int64)
    out_dim = 2 * 32 + 2 * 36 + 2 + 3

    torch_enc = ref_models.PPFEncoder(ppffcs=[84, 32, 32, 16], out_dim=out_dim).eval()
    with torch.no_grad():
        ref_out = torch_enc(
            torch.from_numpy(pc[None]),
            torch.from_numpy(normals[None]),
            torch.from_numpy(feat[None]),
            idxs=torch.from_numpy(idxs),
        )[0].numpy()

    sd = {kk: v.detach().numpy() for kk, v in torch_enc.state_dict().items()}
    params = ppf_encoder_from_torch(sd)
    enc = PPFEncoder(ppffcs=(84, 32, 32, 16), out_dim=out_dim)
    ours = np.asarray(
        enc.apply(params, jnp.array(pc), jnp.array(normals), jnp.array(feat), jnp.array(idxs))
    )
    np.testing.assert_allclose(ours, ref_out, atol=1e-3)


def test_full_stack_matches_reference(rng):
    """PointEncoder → PPFEncoder chained, identical inputs and weights."""
    pc, normals = _make_inputs(rng, n=200)
    k = 60
    out_dim = 2 * 32 + 2 * 36 + 2 + 3
    idxs = rng.integers(0, 200, size=(500, 2)).astype(np.int64)

    t_pt = ref_models.PointEncoder(k=k, spfcs=[32, 64, 32, 32], num_layers=1, out_dim=32).eval()
    t_ppf = ref_models.PPFEncoder(ppffcs=[84, 32, 32, 16], out_dim=out_dim).eval()
    with torch.no_grad():
        dist = torch.cdist(torch.from_numpy(pc[None]), torch.from_numpy(pc[None]))
        sprin = t_pt(torch.from_numpy(pc[None]), torch.from_numpy(normals[None]), dist)
        ref_out = t_ppf(
            torch.from_numpy(pc[None]), torch.from_numpy(normals[None]), sprin,
            idxs=torch.from_numpy(idxs),
        )[0].numpy()

    p_pt = point_encoder_from_torch({kk: v.numpy() for kk, v in t_pt.state_dict().items()})
    p_ppf = ppf_encoder_from_torch({kk: v.numpy() for kk, v in t_ppf.state_dict().items()})
    enc = PointEncoder()
    head = PPFEncoder(out_dim=out_dim)
    nbr = knn_indices(jnp.array(pc), k, chunk=64)
    feat = enc.apply(p_pt, jnp.array(pc), jnp.array(normals), nbr)
    ours = np.asarray(head.apply(p_ppf, jnp.array(pc), jnp.array(normals), feat, jnp.array(idxs)))
    np.testing.assert_allclose(ours, ref_out, atol=2e-3)


def test_rifeat_rotation_invariance(rng):
    """SURVEY §4 property: rifeat features are unchanged under global SO(3)."""
    from scipy.spatial.transform import Rotation

    from cppf_tpu.models.encoders import rifeat

    nbrs = rng.normal(size=(10, 8, 3)).astype(np.float32)
    pts = rng.normal(size=(10, 1, 3)).astype(np.float32)
    R = Rotation.random(random_state=0).as_matrix().astype(np.float32)
    f0 = np.asarray(rifeat(jnp.array(nbrs), jnp.array(pts)))
    f1 = np.asarray(rifeat(jnp.array(nbrs @ R.T), jnp.array(pts @ R.T)))
    np.testing.assert_allclose(f0, f1, atol=1e-4)


def test_roundtrip_conversion(rng):
    """flax → torch → flax keeps PointEncoder params identical."""
    from cppf_tpu.models.convert import point_encoder_to_torch

    enc = PointEncoder()
    pc, normals = _make_inputs(rng, n=64)
    nbr = knn_indices(jnp.array(pc), 8, chunk=64)
    params = enc.init(jax.random.PRNGKey(0), jnp.array(pc), jnp.array(normals), nbr)
    sd = point_encoder_to_torch(params)
    back = point_encoder_from_torch(sd)
    flat0 = jax.tree_util.tree_leaves(params)
    flat1 = jax.tree_util.tree_leaves(back)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_ppf_roundtrip_conversion(rng):
    from cppf_tpu.models.convert import ppf_encoder_from_torch, ppf_encoder_to_torch

    enc = PPFEncoder(out_dim=141)
    pc, normals = _make_inputs(rng, n=32)
    feat = rng.normal(size=(32, 40)).astype(np.float32)
    params = enc.init(jax.random.PRNGKey(0), jnp.array(pc), jnp.array(normals),
                      jnp.array(feat), jnp.zeros((4, 2), jnp.int32))
    back = ppf_encoder_from_torch(ppf_encoder_to_torch(params))
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
