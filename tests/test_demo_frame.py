"""Demo-frame regression pins (VERDICT r3 item 4).

The repo's one piece of real RGB-D data is ``data/demo/0000_{color,depth}.png``
(the reference exercises it in nocs/zero_shot.ipynb cell 2).  Round 2 hit the
failure mode "repo cannot reproduce its own demo" — a checkpoint drift made
the committed zero-shot result unreproducible.  These tests are the tripwire:
they run the COMMITTED checkpoints against the COMMITTED frame on CPU and pin
the round-3 reproduction (ROUND_NOTES session 7: exactly 2 detections on the
two real bowls at z 1.25/1.19 m, bowl-sized scales).

Both tests exercise real-data sim-to-real behaviour end-to-end — everything
from depth decoding through voting runs exactly the committed production code.
"""
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEPTH = os.path.join(REPO, "data", "demo", "0000_depth.png")
CKPT_ZS = os.path.join(REPO, "checkpoints", "bowl_reg")
CKPT_SUP = os.path.join(REPO, "checkpoints")

# the two real bowls, as committed in the round-3 reproduction (zero-shot
# frame = NOCS driver frame: backproject/1000 with x/y negated)
BOWL_CENTERS = np.array([
    [0.0799, -0.1865, 1.2541],
    [0.1599, -0.0345, 1.1941],
])

needs_assets = pytest.mark.skipif(
    not (os.path.exists(DEPTH) and os.path.isdir(CKPT_ZS)),
    reason="committed demo frame / bowl_reg checkpoint missing",
)

# the supervised pin additionally needs the production bowl classification
# checkpoint (checkpoints/bowl/params_best)
needs_bowl_ckpt = pytest.mark.skipif(
    not os.path.isdir(os.path.join(CKPT_SUP, "bowl", "params_best")),
    reason="production bowl checkpoint missing (retrain in progress)",
)


def _load_depth():
    import cv2

    return cv2.imread(DEPTH, -1)


@needs_assets
def test_zero_shot_demo_frame_two_bowls():
    """Zero-shot multi-instance detection on the committed frame: exactly 2
    detections, one per real bowl, at the committed positions and scales
    (reference nocs/zero_shot.ipynb cells 2-13; committed run
    data/demo/zero_shot_r3.png)."""
    from cppf_tpu.config import load_config
    from cppf_tpu.eval.zero_shot import zero_shot_detect
    from cppf_tpu.train.checkpoints import maybe_load_any

    snap = os.path.join(CKPT_ZS, "config.yaml")
    cfg = load_config("bowl", snapshot=snap if os.path.exists(snap) else None)
    cfg.cls_bins = False
    # the proposal-contrast-selected state (eval/contrast_val.py): best-loss
    # selection provably leaves the zero-shot regime (round-2 postmortem)
    params = (maybe_load_any(CKPT_ZS, name="params_zs")
              or maybe_load_any(CKPT_ZS, name="params_best"))
    assert params is not None

    dets = zero_shot_detect(_load_depth(), params, cfg)
    assert len(dets) == 2, f"expected the 2 real bowls, got {len(dets)}"
    got = np.array(sorted([list(d.T) for d in dets]))
    want = np.array(sorted(BOWL_CENTERS.tolist()))
    assert np.linalg.norm(got - want, axis=-1).max() < 0.04
    for d in dets:
        dx, dy, dz = d.scale
        assert 0.10 < dx < 0.22 and 0.10 < dz < 0.22   # bowl diameter
        assert 0.02 < dy < 0.09                        # bowl height


@needs_assets
@needs_bowl_ckpt
def test_supervised_bowl_on_demo_frame():
    """The SUPERVISED bowl pipeline (production driver path, committed
    params_best) on crops of the same frame: recovered centers within 35 mm
    of the committed zero-shot bowls, bowl-sized scales, clean outputs.
    Pins the sim-to-real claim for the classification-bin model, which the
    zero-shot (regression) test cannot cover."""
    import jax

    from cppf_tpu.core.geometry import backproject
    from cppf_tpu.eval.nocs_inference import CategoryRunner
    from cppf_tpu.eval.zero_shot import DEMO_INTRINSICS

    depth = _load_depth()
    pc, _ = backproject(depth, DEMO_INTRINSICS, depth > 0)
    pc = pc / 1000.0
    pc[:, 0] = -pc[:, 0]
    pc[:, 1] = -pc[:, 1]

    class A:
        num_rots = 72
        angle_prec = 1.5
        adaptive_voting = False

    runner = CategoryRunner("bowl", CKPT_SUP, A)
    for T_zs in BOWL_CENTERS:
        # 9 cm ball crop stands in for the reference's Mask-RCNN detection
        # prior (reference nocs/inference.py:46-71 — the pkls don't exist
        # in this environment)
        crop = pc[np.linalg.norm(pc - T_zs, axis=-1) < 0.09].astype(np.float32)
        assert len(crop) > 1000
        out, _ = runner.estimate(jax.random.PRNGKey(0), crop)
        T_est = np.asarray(out.T)
        assert np.linalg.norm(T_est - T_zs) < 0.035
        s = np.asarray(out.scale)
        assert np.all(np.isfinite(s))
        assert 0.10 < s[0] < 0.22 and 0.10 < s[2] < 0.22
        assert 0.02 < s[1] < 0.09
        up = np.asarray(out.up)
        assert np.isclose(np.linalg.norm(up), 1.0, atol=1e-4)
        assert int(out.n_filtered) > 10000
