"""Training entry point.

Equivalent of reference ``train.py:17-122`` re-designed for TPU:

- the host only renders depth and backprojects (C++ rasterizer); jitter,
  voxel downsampling, normal estimation, pair sampling, target generation
  and soft binning run inside a jitted ``prepare_batch`` on device
  (the reference does all of this in 10 NumPy DataLoader workers);
- the train step is jitted and batched (the reference enforces
  batch_size=1); Adam(lr 1e-3, wd 1e-4), KLDiv+BCE+MSE losses;
- checkpoints: every 20 epochs + best loss (reference cadence), orbax
  format with optimizer state for resume (the reference cannot resume).

Usage:
    python -m cppf_tpu.train.loop category=bowl [max_epoch=200] [out_dir=...]
"""
from __future__ import annotations

import json
import logging
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from cppf_tpu.config import Config, load_config, parse_cli_overrides
from cppf_tpu.core.targets import (base_membership, generate_targets,
                                   radial_asymmetry, sample_pair_idxs,
                                   scale_target, soft_bin_targets)
from cppf_tpu.data.shapenet import ShapeNetRenderDataset
from cppf_tpu.pipeline.preprocess import preprocess_cloud
from cppf_tpu.train import checkpoints
from cppf_tpu.train.step import Batch, TrainStatics, init_train_state, make_optimizer, train_step
from cppf_tpu.utils.meters import AverageMeter

log = logging.getLogger("cppf_tpu.train")


_PREP_CACHE: dict = {}


def _prepare_fn(cfg: Config, npoint_pad: int):
    """Build (and cache) the jitted device-side batch-prep program for this
    config: jitter → voxelize → normals → pairs → targets → soft bins."""
    key = (cfg.res, cfg.knn, cfg.train_pairs, cfg.up_sym, cfg.right_sym,
           cfg.z_right, cfg.cls_bins, tuple(cfg.vote_range), tuple(cfg.scale_mean),
           cfg.tr_num_bins, cfg.rot_num_bins, npoint_pad, cfg.aux_weighted,
           cfg.aux_asym, cfg.up_rot_base)
    if key in _PREP_CACHE:
        return _PREP_CACHE[key]

    @jax.jit
    def _prep(rngs, pcs, n_raws, bounds, scales):
        def one(rng_i, pc_raw, n_raw, bound, scale):
            rng_pre, rng_pairs, rng_sign = jax.random.split(rng_i, 3)
            pre = preprocess_cloud(rng_pre, pc_raw, n_raw, cfg.res,
                                   npoint_pad=npoint_pad, knn=cfg.knn)
            # Randomise per-point normal signs: the reference's Open3D PCA
            # normals carry solver-arbitrary signs in BOTH train and test
            # frames, so its network is sign-invariant.  Our deterministic
            # sign rule is frame-dependent (canonical at train, camera at
            # inference) — without this the PPF features distribution-shift.
            sign = jnp.where(
                jax.random.bernoulli(rng_sign, 0.5, (pre.pc.shape[0], 1)), 1.0, -1.0
            )
            normals = pre.normals * sign
            idxs = sample_pair_idxs(rng_pairs, pre.n_valid, cfg.train_pairs)
            asym = (radial_asymmetry(pre.pc, pre.n_valid)
                    if cfg.aux_asym else None)
            base = (base_membership(pre.pc, pre.n_valid)
                    if cfg.up_rot_base else None)
            tgt = generate_targets(pre.pc, normals, idxs,
                                   cfg.up_sym, cfg.right_sym, cfg.z_right,
                                   asym=asym, base=base)
            st = scale_target(bound, scale, cfg.scale_mean)
            if cfg.cls_bins:
                tr_t, rot_t = soft_bin_targets(tgt, cfg.vote_range,
                                               cfg.tr_num_bins, cfg.rot_num_bins)
            else:
                tr_t, rot_t = tgt.tr, tgt.rot
            out = (pre.pc, normals, pre.n_valid, idxs, tr_t, rot_t, tgt.rot_aux, st)
            if cfg.aux_weighted:
                out = out + (tgt.aux_weight,)
            if cfg.up_rot_base:
                assert cfg.aux_weighted, "up_rot_base requires aux_weighted (positional Batch)"
                out = out + (tgt.up_rot_weight,)
            return out

        return Batch(*jax.vmap(one)(rngs, pcs, n_raws, bounds, scales))

    _PREP_CACHE[key] = _prep
    return _prep


def build_batch(cfg: Config, rng: jax.Array, samples, npoint_pad: int) -> Batch:
    """Assemble a device Batch from host RenderedSamples."""
    n_raw_pad = cfg.npoint_max
    pcs, n_raws, bounds, scales = [], [], [], []
    for s in samples:
        pc = s.pc[: n_raw_pad]
        pad = np.zeros((n_raw_pad, 3), np.float32)
        pad[: len(pc)] = pc
        pcs.append(pad)
        n_raws.append(len(pc))
        bounds.append(s.bound)
        scales.append(s.scale)
    prep = _prepare_fn(cfg, npoint_pad)
    return prep(
        jax.random.split(rng, len(samples)),
        jnp.asarray(np.stack(pcs)),
        jnp.asarray(np.array(n_raws, np.int32)),
        jnp.asarray(np.stack(bounds)),
        jnp.asarray(np.array(scales, np.float32)),
    )


def train(cfg: Config, out_dir: str | None = None, epoch_len: int | None = None,
          dataset=None, resume: bool = False) -> dict:
    out_dir = out_dir or os.path.join("checkpoints", cfg.category)
    os.makedirs(out_dir, exist_ok=True)
    cfg.save(os.path.join(out_dir, "config.yaml"))  # snapshot for inference

    ds = dataset or ShapeNetRenderDataset(cfg, seed=cfg.seed)
    if dataset is None:
        # multi-host pod: disjoint model shard + decorrelated RNG per process
        # (identity on one host; SURVEY §7 step 8)
        from cppf_tpu.parallel.input_pipeline import shard_dataset

        shard_dataset(ds)
    if epoch_len is not None:
        ds.epoch_len = epoch_len
    statics = TrainStatics.from_config(cfg)
    tx = make_optimizer(cfg)
    state = init_train_state(jax.random.PRNGKey(cfg.seed), cfg, cfg.npoint_pad)
    start_epoch = 0
    metrics_path = os.path.join(out_dir, "metrics.jsonl")
    resume_name = next((n for n in ("last", "best")
                        if os.path.isdir(os.path.join(out_dir, n))), None)
    if resume and resume_name:
        # full resume (params + optimizer state + step) — the reference can
        # only reload weights (SURVEY §5: save-only checkpoints).  "last" is
        # written every epoch so interrupted runs resume where they stopped;
        # "best" is the best-loss state (what inference loads via params_best)
        state = checkpoints.load_train_state(out_dir, state, name=resume_name)
        start_epoch = int(state.step) // max(1, len(ds) // cfg.batch_size)
        log.info("resumed from %s at step %d (epoch %d)", out_dir, int(state.step), start_epoch)
    elif resume and os.path.isdir(os.path.join(out_dir, "params_best")):
        # params-only warm start (older runs saved no optimizer state);
        # recover the epoch count from the metrics log so budgets extend
        # past the previous run instead of restarting it
        params = checkpoints.load_params(out_dir, name="params_best")
        state = state._replace(params=jax.tree.map(jnp.asarray, params))
        if os.path.exists(metrics_path):
            with open(metrics_path) as f:
                epochs = [json.loads(l)["epoch"] for l in f if l.strip()]
            start_epoch = (max(epochs) + 1) if epochs else 0
        log.info("warm-started params from %s/params_best (epoch %d, fresh optimizer)",
                 out_dir, start_epoch)

    rng = jax.random.fold_in(jax.random.PRNGKey(cfg.seed + 1), start_epoch)
    best_loss = np.inf
    best_zs = -np.inf
    best_dv = np.inf
    decode_val = None
    if cfg.decode_val_every > 0 and cfg.cls_bins:
        from cppf_tpu.train.decode_val import DecodeValidator

        decode_val = DecodeValidator(cfg)
        dv_path = os.path.join(out_dir, "decode_metrics.jsonl")
        if os.path.exists(dv_path):  # resume: keep the standing best
            with open(dv_path) as f:
                scores = [json.loads(l).get("dv_score") for l in f if l.strip()]
            scores = [s for s in scores if s is not None]
            if scores:
                best_dv = min(scores)
    val_scene = None
    if cfg.contrast_val_every > 0 and not cfg.cls_bins:
        from cppf_tpu.eval.contrast_val import make_val_scene

        val_scene = make_val_scene(cfg.category)
        zs_path = os.path.join(out_dir, "zs_metrics.jsonl")
        if os.path.exists(zs_path):  # resume: keep the standing best
            with open(zs_path) as f:
                scores = [json.loads(l).get("zs_score") for l in f if l.strip()]
            if scores:
                best_zs = max(scores)
    if start_epoch > 0 and os.path.exists(metrics_path):
        # seed best-loss from the log so the first post-resume epoch cannot
        # silently overwrite params_best with a worse state
        with open(metrics_path) as f:
            losses = [json.loads(l).get("loss") for l in f if l.strip()]
        losses = [l for l in losses if l is not None]
        if losses:
            best_loss = min(losses)
    history = []
    for epoch in range(start_epoch, cfg.max_epoch):
        meters: dict[str, AverageMeter] = {}
        t0 = time.time()
        steps = max(1, len(ds) // cfg.batch_size)
        # keep per-step loss components as device arrays until epoch end —
        # float() every step would block dispatch and serialize host render
        # with the device step
        step_comps = []
        for _ in range(steps):
            samples = [ds.sample() for _ in range(cfg.batch_size)]
            rng, rb = jax.random.split(rng)
            batch = build_batch(cfg, rb, samples, cfg.npoint_pad)
            state, comps = train_step(state, batch, statics, tx)
            step_comps.append(comps)
        for comps in jax.device_get(step_comps):
            for k, v in comps.items():
                meters.setdefault(k, AverageMeter()).update(float(v))
        avg = {k: m.avg for k, m in meters.items()}
        history.append(avg)
        with open(metrics_path, "a") as f:
            f.write(json.dumps({"epoch": epoch, "wall_s": round(time.time() - t0, 2), **avg}) + "\n")
        log.info(
            "epoch %d  %s  (%.1fs)", epoch,
            "  ".join(f"{k}={v:.4f}" for k, v in sorted(avg.items())),
            time.time() - t0,
        )
        if epoch % 20 == 0:
            checkpoints.save_train_state(out_dir, state, name=f"epoch{epoch}")
        checkpoints.save_train_state(out_dir, state, name="last")
        if avg["loss"] < best_loss:
            best_loss = avg["loss"]
            checkpoints.save_train_state(out_dir, state, name="best")
            if decode_val is None:
                # legacy reference behavior (train.py:113-120): best loss IS
                # the production selection when decode validation is off
                checkpoints.save_params(out_dir, state.params, name="params_best")
        if decode_val is not None and (
                (epoch + 1) % cfg.decode_val_every == 0
                or epoch == cfg.max_epoch - 1):
            rng, kdv = jax.random.split(rng)
            dv = decode_val(jax.device_get(state.params), kdv)
            dv["epoch"] = epoch
            with open(os.path.join(out_dir, "decode_metrics.jsonl"), "a") as f:
                f.write(json.dumps(dv) + "\n")
            log.info("decode val epoch %d: %s", epoch,
                     "  ".join(f"{k}={v}" for k, v in sorted(dv.items())
                               if k != "epoch"))
            if dv["dv_score"] < best_dv:
                best_dv = dv["dv_score"]
                checkpoints.save_params(out_dir, state.params, name="params_best")
                checkpoints.save_train_state(out_dir, state, name="best_decode")
        if val_scene is not None and (epoch + 1) % cfg.contrast_val_every == 0:
            from cppf_tpu.eval.contrast_val import proposal_contrast_score

            zs = proposal_contrast_score(val_scene[0], val_scene[1],
                                         jax.device_get(state.params), cfg)
            zs["epoch"] = epoch
            with open(os.path.join(out_dir, "zs_metrics.jsonl"), "a") as f:
                f.write(json.dumps(zs) + "\n")
            log.info("contrast val epoch %d: score=%.1f hits=%d false=%d",
                     epoch, zs["zs_score"], zs["zs_hits"], zs["zs_false"])
            if zs["zs_score"] > best_zs:
                best_zs = zs["zs_score"]
                checkpoints.save_params(out_dir, state.params, name="params_zs")
    return {"state": state, "best_loss": best_loss, "history": history}


def main(argv=None):
    from cppf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    logging.basicConfig(level=logging.INFO, format="[%(asctime)s][%(name)s] %(message)s", force=True)
    argv = argv if argv is not None else sys.argv[1:]
    overrides = parse_cli_overrides([a for a in argv if "=" in a])
    category = overrides.pop("category", "bowl")
    out_dir = overrides.pop("out_dir", None)
    epoch_len = overrides.pop("epoch_len", None)
    resume = bool(overrides.pop("resume", False))
    cfg = load_config(category, overrides)
    log.info("training category=%s res=%g bins=(%d,%d) pairs=%d",
             cfg.category, cfg.res, cfg.tr_num_bins, cfg.rot_num_bins, cfg.train_pairs)
    train(cfg, out_dir=out_dir, epoch_len=epoch_len, resume=resume)


if __name__ == "__main__":
    main()
