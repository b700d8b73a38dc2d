"""Multi-device tests on the 8-virtual-CPU mesh (SURVEY §4)."""
import jax
import jax.numpy as jnp
import numpy as np

from cppf_tpu.ops.voting import ppf_vote
from cppf_tpu.parallel.mesh import make_mesh, sharded_ppf_vote


def test_mesh_factoring():
    mesh = make_mesh(8)
    assert mesh.shape["data"] * mesh.shape["pair"] == 8


def test_pair_sharded_vote_matches_single_device(rng):
    n, p = 64, 1024
    pc = (rng.uniform(size=(n, 3)) * 0.2).astype(np.float32)
    idxs = rng.integers(0, n, size=(p, 2)).astype(np.int32)
    a, b = pc[idxs[:, 0]], pc[idxs[:, 1]]
    u = (a - b) / (np.linalg.norm(a - b, axis=-1, keepdims=True) + 1e-7)
    center = pc.mean(0)
    proj = np.sum((a - center) * u, -1)
    odist = np.linalg.norm(a - center - proj[:, None] * u, axis=-1)
    preds_tr = np.stack([proj, odist], -1).astype(np.float32)
    probs = np.ones(n, np.float32)
    corner = pc.min(0)
    res = 0.01
    dims = ((pc.max(0) - corner) / res).astype(np.int32) + 1
    gshape = (24, 24, 24)

    single = ppf_vote(
        jnp.array(pc), jnp.array(preds_tr), jnp.array(probs), jnp.array(idxs),
        jnp.array(corner), res, jnp.array(dims), gshape, n_rots=16, chunk=256,
    )
    mesh = make_mesh(8)
    multi = sharded_ppf_vote(
        mesh, jnp.array(pc), jnp.array(preds_tr), jnp.array(probs), jnp.array(idxs),
        jnp.array(corner), res, jnp.array(dims), gshape, n_rots=16,
    )
    np.testing.assert_allclose(np.asarray(multi), np.asarray(single), atol=1e-3)


def test_dryrun_multichip_entry():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
