"""Configuration system.

The reference drives training with Hydra (``config/config.yaml`` plus a
``category/`` group of ``# @package _global_`` overrides; see reference
``config/config.yaml:1-29``) and re-reads the training-time snapshot at
inference (reference ``nocs/inference.py:81``).  Hydra is not available in
this environment, so we provide a small, dependency-free equivalent with the
same layered semantics:

    defaults (config.py)  <  configs/default.yaml  <  configs/category/<cat>.yaml  <  CLI overrides

A resolved config is snapshotted next to checkpoints as ``config.yaml`` and
re-loaded at inference, mirroring the reference behaviour.
"""
from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import yaml

CONFIG_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")


@dataclass
class OptConfig:
    lr: float = 1e-3
    weight_decay: float = 1e-4


@dataclass
class Config:
    """Training / model / voting hyper-parameters.

    Field names and default values follow the reference Hydra config
    (reference ``config/config.yaml``) so that category YAMLs stay
    schema-compatible.
    """

    category: str = "bowl"
    # Master training seed: init params, data stream, and per-epoch rng all
    # derive from it, so a run is a pure function of (code, config) —
    # change `seed` to draw an independent training trajectory (re-roll).
    # The reference has no seed control at all (torch default seeding,
    # reference train.py:17-122), so two reference runs differ implicitly;
    # here variance re-rolls are explicit and reproducible.
    seed: int = 0
    batch_size: int = 1
    res: float = 5e-3
    max_epoch: int = 200
    npoint_max: int = 10000
    use_normal: bool = True
    regress_right: bool = False
    tr_num_bins: int = 32
    rot_num_bins: int = 36
    up_sym: bool = False
    right_sym: bool = False
    z_right: bool = False
    cls_bins: bool = True
    knn: int = 60
    shapenet_root: str = "./data/ShapeNetCore.v2"
    opt: OptConfig = field(default_factory=OptConfig)

    # per-category statistics (produced by cppf_tpu.data.stats / gen_stats)
    scale_range: Tuple[float, float] = (0.1851, 0.2381)
    vote_range: Tuple[float, float] = (0.12, 0.12)
    scale_mean: Tuple[float, float, float] = (0.07, 0.03, 0.07)

    # Structured-light depth-noise augmentation of training renders
    # (sim-to-real; no reference counterpart — the reference relies on
    # ShapeNet detail + the res/4 cloud jitter alone).  0 disables; 1.0 is
    # a Kinect-like magnitude (see data/shapenet.py::apply_depth_noise).
    depth_noise: float = 0.0

    # Weight the aux orientation-bit BCE by per-pair informativeness
    # |n_canon·axis| (no reference counterpart — the reference's unweighted
    # BCE trains the bit to chance on near-revolution bodies, which is what
    # its right-axis failures on mug/camera trace back to).
    aux_weighted: bool = True

    # Inference-side axis-voting robustness for near-revolution bodies (no
    # reference counterpart; see pipeline/pose.py::PoseConfig for the full
    # rationale).  sharp_axis_votes: weight cone votes by the pair's angle-
    # distribution confidence.  aux_align_weight: weight the ± aux-bit
    # disambiguation by |n_canon·axis| target reliability.
    sharp_axis_votes: bool = False
    aux_align_weight: bool = False
    # Geometric right-axis focus: bias the right-axis cone-vote subsample and
    # aux disambiguation toward pairs touching radially-protruding geometry
    # (handle/lens) about the voted up axis.  For near-revolution
    # regress_right categories (mug, camera); see PoseConfig.asym_right_votes.
    asym_right_votes: bool = False
    # Second-pass center vote weighted by the same radial-asymmetry score:
    # azimuth-ambiguous wall pairs predict marginalised dist2o, which reads
    # as radius excess on the far wall and drags the center-vote peak toward
    # the protruding geometry (measured: mug T displaced 10-20 mm toward the
    # handle); see PoseConfig.asym_center_refine.
    asym_center_refine: bool = False
    # Sub-voxel Gauss-Newton center solve on the back-vote survivors —
    # removes the voxel-argmax quantisation floor; see
    # PoseConfig.subvoxel_refine.
    subvoxel_refine: bool = False
    # Geometric right-axis sign from the protrusion-centroid direction
    # (right = ĥ × up); see PoseConfig.geo_right_sign.
    geo_right_sign: bool = False
    # Protrusion→right mapping: "cross" (mug handle ⊥ right) or "direct"
    # (table drawer pedestal along +x); see PoseConfig.geo_right_dir.
    geo_right_dir: str = "cross"
    # Multi-hypothesis axis decode (top-K sphere peaks re-scored by aux
    # BCE); fixes wrong-plane-normal axis locks on plane-dominated bodies.
    # 1 = reference argmax behaviour; see PoseConfig.axis_topk.
    axis_topk: int = 1
    # Inference-side, host post-step: anchor the voted center against the
    # observed instance extents along the voted box axes
    # (eval/anchor.py::anchor_box_t — silhouette midpoints + camera-facing
    # face anchors).  Addresses the vote decode's center bias toward
    # visible surface mass; off by default, enabled per category by A/B
    # (the anchor can hurt when the instance is externally occluded or
    # image-clipped and the voted center is already good).
    anchor_t: bool = False

    # Train-side: additionally scale the right-bit aux weight by the pair's
    # radial-asymmetry score (core/targets.py::radial_asymmetry) so only
    # symmetry-breaking geometry (handle, lens) teaches the bit.  For
    # near-revolution regress_right categories; |n·right| alone concentrates
    # the weight on azimuth-ambiguous wall pairs whose bit is unlearnable.
    aux_asym: bool = False

    # Inference-side: pin float32 matmul precision across the pose pipeline
    # (network, KNN, decode projections).  The TPU MXU's default bf16
    # multiplies tip near-tie axis decodes: sofa n=8, same checkpoint/seed,
    # TPU-default up 84.5° vs f32 17.9° — and the f32 TPU run matches CPU
    # almost bit-for-bit (T median identical).  No effect on CPU.
    # "decode" (default) pins only the decode half — the network stays on
    # the TPU-default bf16 MXU passes.  A/B'd round 5 (BENCH.md): quality
    # matches full f32 on the precision-sensitive categories (sofa
    # identical; mug/camera right differences inside the chance-sign band,
    # camera actually better) at ~6% less latency (20.1 vs 21.4 ms/pose).
    pose_f32: bool | str = "decode"

    # Train-side: multiply the right-bit BCE inside the total loss (the
    # logged component stays raw).  The bit is ~0.7 of a ~9.0 total and
    # learns but is gradient-starved (camera r4: 0.694→0.666 over 90
    # epochs); 1.0 = reference-parity unboosted sum.
    right_aux_boost: float = 1.0

    # Train-side: weight the up-angle KL by bottom-slab (base) membership of
    # the pair (core/targets.py::base_membership) so hinge-ambiguous lid-lid
    # pairs of articulated clamshell bodies stop teaching the up head.  For
    # laptop.
    up_rot_base: bool = False

    # Zero-shot proposal-contrast validation cadence (epochs; 0 = off).
    # Regression-variant (cls_bins=False) training only: every N epochs a
    # fixed cluttered synthetic scene is scored by the proposal extractor
    # and the best state is snapshotted as params_zs — best-train-loss
    # selection provably destroys the zero-shot regime (round-2 postmortem:
    # 612→0 proposals on the real frame across epochs 60→200).
    contrast_val_every: int = 0

    # Decode-quality validation cadence (epochs; 0 = off).  Supervised
    # (cls_bins=True) training only: every N epochs a fixed held-out set of
    # ``decode_val_poses`` rendered poses is decoded by the full voting
    # pipeline with the current params, and params_best is selected on the
    # decode score (train/decode_val.py) instead of total loss — round-4
    # postmortem: three retrains hit round-3-level losses yet decoded at
    # up-error 88°/30°/chance-sign and were all rejected head-to-head; loss
    # is blind to decode quality.  Upgrades reference train.py:113-120.
    decode_val_every: int = 0
    decode_val_poses: int = 6

    # --- TPU-specific static-shape knobs (no reference counterpart) -------
    # Number of sampled point pairs per training sample / inference instance.
    train_pairs: int = 200000
    infer_pairs: int = 100000
    # Padded point budget for jitted pipelines (points beyond are dropped,
    # fewer are zero-padded + masked).
    npoint_pad: int = 8192
    # Static vote-grid edge (voxels). The runtime grid extent stays dynamic
    # (derived from the point cloud's bounding box as in the reference); the
    # static edge only bounds the compiled buffer.
    grid_edge: int = 0  # 0 = derive from scale_range / res at resolve time

    # voting parameters (reference nocs/inference.py:38-42)
    num_rots: int = 72
    angle_prec: float = 1.5
    adaptive_voting: bool = False
    # drop coplanar-indistinguishable pairs from center voting (the
    # zero-shot notebook's cell-6 filter; fixes the mirror-peak T failure
    # on plane-dominated SUN views — see pipeline.pose.PoseConfig)
    filter_coplanar: bool = False
    # instead of dropping coplanar pairs, keep them but gate each pair's
    # vote circle to the object-interior half-space behind the observed
    # surface (camera-oriented normal) — redirects the mirror-peak vote
    # mass onto the true center instead of starving it; see
    # pipeline.pose.PoseConfig.coplanar_halfspace.  Takes precedence over
    # filter_coplanar when both are set.
    coplanar_halfspace: bool = False
    # surface-patch-stratified pair sampling exponent (0 = uniform): weight
    # each point by 1/count(8·res cell)^alpha so dominant planes with
    # correlated per-pair vote errors can't outvote the rarer independent
    # geometry; see pipeline.pose.sample_pair_indices
    pair_balance: float = 0.0
    # center-vote pair-separation weighting exponent (see
    # pipeline.pose.PoseConfig.pair_sep_power); inference-only
    pair_sep_power: float = 0.0

    def resolved_grid_edge(self) -> int:
        if self.grid_edge:
            return self.grid_edge
        # The instance crop extent is bounded by the largest object diagonal
        # plus jitter; one extra voxel mirrors the reference's `+ 1` sizing
        # (reference nocs/inference.py:195).
        edge = int(self.scale_range[1] / self.res) + 4
        # round up to a multiple of 8 to keep TPU-friendly layouts
        return (edge + 7) // 8 * 8

    @property
    def out_dim(self) -> int:
        """PPF head output width (reference train.py:35)."""
        if self.cls_bins:
            return 2 * self.tr_num_bins + 2 * self.rot_num_bins + 2 + 3
        return 2 + 2 + 2 + 3  # regression variant (zero-shot notebook, cell 1)

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        return d

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=False)


def _apply(cfg: dict, overrides: dict) -> dict:
    for k, v in overrides.items():
        if k == "defaults":
            continue
        if isinstance(v, dict) and isinstance(cfg.get(k), dict):
            _apply(cfg[k], v)
        else:
            cfg[k] = v
    return cfg


def load_config(
    category: Optional[str] = None,
    overrides: Optional[dict] = None,
    config_root: Optional[str] = None,
    snapshot: Optional[str] = None,
) -> Config:
    """Compose a Config.

    ``snapshot`` (a resolved config.yaml written by ``Config.save``) takes
    priority over the layered composition — used by inference to re-read the
    training-time snapshot like the reference does.
    """
    root = config_root or CONFIG_ROOT
    base = dataclasses.asdict(Config())
    if snapshot is not None:
        with open(snapshot) as f:
            _apply(base, yaml.safe_load(f) or {})
    else:
        default_path = os.path.join(root, "default.yaml")
        if os.path.exists(default_path):
            with open(default_path) as f:
                _apply(base, yaml.safe_load(f) or {})
        if category is not None:
            cat_path = os.path.join(root, "category", f"{category}.yaml")
            if os.path.exists(cat_path):
                with open(cat_path) as f:
                    _apply(base, yaml.safe_load(f) or {})
            else:
                base["category"] = category
    if overrides:
        _apply(base, overrides)

    opt = OptConfig(**base.pop("opt", {}))
    known = {f.name for f in dataclasses.fields(Config)}
    kwargs = {k: v for k, v in base.items() if k in known}
    for key in ("scale_range", "vote_range", "scale_mean"):
        if key in kwargs and isinstance(kwargs[key], list):
            kwargs[key] = tuple(kwargs[key])
    kwargs["opt"] = opt
    return Config(**kwargs)


def parse_cli_overrides(args: List[str]) -> dict:
    """Parse ``key=value`` (possibly dotted) CLI overrides, hydra-style."""
    out: dict = {}
    for a in args:
        if "=" not in a:
            raise ValueError(f"override must look like key=value, got {a!r}")
        k, v = a.split("=", 1)
        try:
            v = yaml.safe_load(v)
        except yaml.YAMLError:
            pass
        if isinstance(v, str):
            # YAML 1.1 leaves "5e-4" (no dot) as a string; coerce numerics
            try:
                v = int(v)
            except ValueError:
                try:
                    v = float(v)
                except ValueError:
                    pass
        cur = out
        parts = k.split(".")
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = v
    return out
