"""Training loop tests: loss decreases on a fixed synthetic task and
checkpoints roundtrip."""
import numpy as np
import pytest

import jax

from cppf_tpu.config import load_config
from cppf_tpu.data.shapenet import ShapeNetRenderDataset
from cppf_tpu.train.loop import build_batch, train
from cppf_tpu.train.step import TrainStatics, init_train_state, make_optimizer, train_step


def _small_cfg():
    cfg = load_config("bowl")
    cfg.knn = 12
    cfg.npoint_pad = 512
    cfg.npoint_max = 2000
    cfg.train_pairs = 2048
    cfg.batch_size = 2
    cfg.max_epoch = 2
    cfg.decode_val_every = 0  # full-pipeline decode val tested separately
    return cfg


def test_build_batch_shapes():
    cfg = _small_cfg()
    ds = ShapeNetRenderDataset(cfg, seed=0)
    samples = [ds.sample() for _ in range(2)]
    batch = build_batch(cfg, jax.random.PRNGKey(0), samples, cfg.npoint_pad)
    assert batch.pc.shape == (2, 512, 3)
    assert batch.point_idxs.shape == (2, 2048, 2)
    assert batch.tr_prob.shape == (2, 2048, 2, cfg.tr_num_bins)
    assert batch.rot_prob.shape == (2, 2048, 2, cfg.rot_num_bins)
    assert np.isfinite(np.asarray(batch.scale_target)).all()
    # targets are valid distributions
    np.testing.assert_allclose(np.asarray(batch.tr_prob).sum(-1), 1.0, atol=1e-5)


def test_loss_decreases():
    cfg = _small_cfg()
    ds = ShapeNetRenderDataset(cfg, seed=0)
    statics = TrainStatics.from_config(cfg)
    tx = make_optimizer(cfg)
    state = init_train_state(jax.random.PRNGKey(0), cfg, cfg.npoint_pad)
    samples = [ds.sample() for _ in range(2)]
    batch = build_batch(cfg, jax.random.PRNGKey(1), samples, cfg.npoint_pad)
    losses = []
    for _ in range(15):
        state, comps = train_step(state, batch, statics, tx)
        losses.append(float(comps["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses
    assert np.isfinite(losses).all()


def test_right_aux_boost_scales_total_only():
    """right_aux_boost multiplies the right-bit BCE inside the total; the
    logged component and every other term stay bit-identical, and boost=1
    reproduces the unboosted total exactly."""
    import jax.numpy as jnp

    from cppf_tpu.train.losses import ppf_losses

    rng = np.random.default_rng(0)
    P, B, R = 64, 8, 6
    preds = jnp.asarray(rng.normal(size=(P, 2 * B + 2 * R + 2 + 3)), jnp.float32)
    tr = jax.nn.softmax(jnp.asarray(rng.normal(size=(P, 2, B)), jnp.float32), -1)
    rot = jax.nn.softmax(jnp.asarray(rng.normal(size=(P, 2, R)), jnp.float32), -1)
    aux = jnp.asarray(rng.integers(0, 2, size=(P, 2)), jnp.float32)
    st = jnp.asarray(rng.normal(size=(3,)), jnp.float32)

    t1, c1 = ppf_losses(preds, tr, rot, aux, st, B, R, True)
    t3, c3 = ppf_losses(preds, tr, rot, aux, st, B, R, True, right_aux_boost=3.0)
    assert float(t1) == float(c1["loss"])
    np.testing.assert_allclose(float(t3 - t1), 2.0 * float(c1["loss_right_aux"]),
                               rtol=1e-5)
    for k in ("loss_tr", "loss_up", "loss_right", "loss_right_aux", "loss_up_aux",
              "loss_scale"):
        assert float(c1[k]) == float(c3[k]), k


def test_train_one_epoch_and_checkpoint(tmp_path):
    cfg = _small_cfg()
    cfg.max_epoch = 1
    out = train(cfg, out_dir=str(tmp_path / "ckpt"), epoch_len=2)
    assert np.isfinite(out["best_loss"])
    # snapshot + checkpoints written
    import os

    assert os.path.exists(tmp_path / "ckpt" / "config.yaml")
    from cppf_tpu.train.checkpoints import load_params

    params = load_params(str(tmp_path / "ckpt"), name="params_best")
    leaves = jax.tree_util.tree_leaves(params)
    ref_leaves = jax.tree_util.tree_leaves(out["state"].params)
    for a, b in zip(leaves, ref_leaves):
        np.testing.assert_allclose(a, np.asarray(b), atol=0)

    # config snapshot reloads identically
    from cppf_tpu.config import load_config as lc

    cfg2 = lc(snapshot=str(tmp_path / "ckpt" / "config.yaml"))
    assert cfg2.category == cfg.category
    assert cfg2.res == cfg.res
    assert tuple(cfg2.vote_range) == tuple(cfg.vote_range)


def test_regression_variant_training():
    """cls_bins=False (zero-shot regression head) trains end-to-end."""
    cfg = _small_cfg()
    cfg.cls_bins = False
    ds = ShapeNetRenderDataset(cfg, seed=0)
    statics = TrainStatics.from_config(cfg)
    assert cfg.out_dim == 9
    tx = make_optimizer(cfg)
    state = init_train_state(jax.random.PRNGKey(0), cfg, cfg.npoint_pad)
    samples = [ds.sample() for _ in range(2)]
    batch = build_batch(cfg, jax.random.PRNGKey(1), samples, cfg.npoint_pad)
    assert batch.tr_prob.shape == (2, cfg.train_pairs, 2)  # raw values, not bins
    losses = []
    for _ in range(10):
        state, comps = train_step(state, batch, statics, tx)
        losses.append(float(comps["loss"]))
    assert losses[-1] < losses[0]


def test_decode_val_selection(tmp_path):
    """decode_val_every>0 routes params_best through the decode score:
    metrics land in decode_metrics.jsonl, the score is finite, and the
    committed params_best equals the state at the (single) validation."""
    import json
    import os

    cfg = _small_cfg()
    cfg.max_epoch = 1
    cfg.infer_pairs = 2048
    cfg.num_rots = 18
    cfg.decode_val_every = 1
    cfg.decode_val_poses = 2
    out = train(cfg, out_dir=str(tmp_path / "ckpt"), epoch_len=2)
    dv_path = tmp_path / "ckpt" / "decode_metrics.jsonl"
    assert os.path.exists(dv_path)
    rows = [json.loads(l) for l in open(dv_path)]
    assert len(rows) == 1 and rows[0]["epoch"] == 0
    assert np.isfinite(rows[0]["dv_score"])
    for k in ("dv_t_pct", "dv_up_deg", "dv_scale_pct"):
        assert np.isfinite(rows[0][k]), k
    # the decode-selected params_best is the epoch-0 state (only candidate)
    from cppf_tpu.train.checkpoints import load_params

    params = load_params(str(tmp_path / "ckpt"), name="params_best")
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(out["state"].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    # best_decode train state exists for decode-selected resume
    assert os.path.isdir(tmp_path / "ckpt" / "best_decode")


def test_decode_validator_scores_oracle_vs_random():
    """A DecodeValidator built on tiny shapes returns finite metrics and the
    expected keys for a regress_right category (right-line term present)."""
    from cppf_tpu.train.decode_val import DecodeValidator
    from cppf_tpu.train.step import init_train_state

    cfg = load_config("mug")
    cfg.knn = 12
    cfg.npoint_pad = 512
    cfg.npoint_max = 2000
    cfg.infer_pairs = 2048
    cfg.num_rots = 18
    cfg.decode_val_poses = 2
    dv = DecodeValidator(cfg)
    assert len(dv.poses) == 2
    state = init_train_state(jax.random.PRNGKey(0), cfg, cfg.npoint_pad)
    m = dv(jax.device_get(state.params), jax.random.PRNGKey(1))
    assert np.isfinite(m["dv_score"])
    assert "dv_right_line_deg" in m
    # random-init params should decode poorly — the score must not read
    # as better than a few degrees total (guards against a trivially-zero
    # metric wiring bug)
    assert m["dv_score"] > 5.0


def test_full_train_state_roundtrip(tmp_path):
    """save_train_state/load_train_state preserves params, optimizer state
    and step (host-numpy restore path)."""
    from cppf_tpu.train.checkpoints import load_train_state, save_train_state

    cfg = _small_cfg()
    state = init_train_state(jax.random.PRNGKey(3), cfg, cfg.npoint_pad)
    state = state._replace(step=state.step + 7)
    save_train_state(str(tmp_path / "ck"), state, name="best")
    fresh = init_train_state(jax.random.PRNGKey(9), cfg, cfg.npoint_pad)
    restored = load_train_state(str(tmp_path / "ck"), fresh, name="best")
    assert int(restored.step) == 7
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
