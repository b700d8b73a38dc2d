"""Proposal-contrast validation metric: a center-perfect oracle must score
high (both objects found, no junk) and a diffuse predictor must score low —
the property that makes params_zs selection meaningful (round-2 postmortem:
best-train-loss selection destroyed the zero-shot regime)."""
import numpy as np

from cppf_tpu.config import load_config
from cppf_tpu.eval.contrast_val import make_val_scene, proposal_contrast_score


def _oracle_predict(centers, cfg, attach=0.15):
    def predict(pc, pc_normal, idxs):
        d2 = np.stack([np.linalg.norm(pc - c, axis=-1) for c in centers], -1)
        owner = np.argmin(d2, -1)
        owned = d2[np.arange(len(pc)), owner] < attach
        a, b = pc[idxs[:, 0]], pc[idxs[:, 1]]
        same = (owner[idxs[:, 0]] == owner[idxs[:, 1]]) & owned[idxs[:, 0]] & owned[idxs[:, 1]]
        T = np.stack(centers)[owner[idxs[:, 0]]]
        d = a - b
        du = d / (np.linalg.norm(d, axis=-1, keepdims=True) + 1e-7)
        rel = a - T
        proj = np.sum(rel * du, -1)
        odist = np.linalg.norm(rel - proj[:, None] * du, axis=-1)
        out = np.zeros((len(idxs), 9), np.float32)
        out[:, 0] = np.where(same, proj, 10.0)   # clutter votes off-grid
        out[:, 1] = np.where(same, odist, 10.0)
        return out

    return predict


def _diffuse_predict(pc, pc_normal, idxs):
    r = np.random.default_rng(0)
    out = np.zeros((len(idxs), 9), np.float32)
    out[:, 0] = r.uniform(-0.3, 0.3, len(idxs))
    out[:, 1] = r.uniform(0, 0.3, len(idxs))
    return out


def test_contrast_score_separates_sharp_from_diffuse():
    cfg = load_config("bowl")
    cfg.cls_bins = False
    depth, centers = make_val_scene("bowl", noise=1.0)
    # thresh scaled to the 150k-pair operating point (signal ~11-23 raw,
    # diffuse noise ~0.6 — see proposal_contrast_score's threshold note)
    common = dict(n_pairs=150000, num_rots=36, prop_thresh=5.0)
    good = proposal_contrast_score(depth, centers, None, cfg,
                                   predict_fn=_oracle_predict(centers, cfg), **common)
    bad = proposal_contrast_score(depth, centers, None, cfg,
                                  predict_fn=_diffuse_predict, **common)
    assert good["zs_hits"] == 2, good
    assert good["zs_false"] <= 1, good
    assert bad["zs_hits"] == 0, bad
    assert good["zs_score"] > bad["zs_score"] + 100


def test_val_scene_deterministic():
    d0, c0 = make_val_scene("bowl")
    d1, c1 = make_val_scene("bowl")
    assert (d0 == d1).all()
    np.testing.assert_allclose(c0, c1)
