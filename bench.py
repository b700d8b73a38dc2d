"""Benchmark: point-pairs/sec and ms/object-pose of the full jitted 9D pose
pipeline on the current accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Baseline: the reference publishes no numbers (BASELINE.md), and its CuPy/CUDA
path cannot run here, so ``vs_baseline`` compares against a *measured*
vectorised host-NumPy implementation of the identical per-instance workload
(network forward + center vote + backvote + axis vote + sphere binning) run
in this same process — a transparent, reproducible stand-in recorded under
``baseline_*`` keys.

Outage behaviour: this script NEVER exits with a traceback and no JSON.  If
the axon TPU relay is down it waits up to ``BENCH_RELAY_WAIT_S`` (default
300 s), then falls back to a clearly-labeled CPU run with
``"error": "tpu_unavailable"`` in the JSON; if even that fails the final
line is a minimal JSON error record (round-3 lesson: one relay outage
zeroed the round's perf artifact).
"""
from __future__ import annotations

import json
import os
import socket
import sys
import time

import numpy as np


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def _relay_up(host="127.0.0.1", port=8082, timeout=3.0):
    try:
        with socket.create_connection((host, port), timeout=timeout):
            return True
    except OSError:
        return False


def _acquire_device():
    """Return (jax, device, error_tag).  Waits for the axon relay, falls back
    to CPU (labeled) if it never comes up — never raises."""
    wait_s = float(os.environ.get("BENCH_RELAY_WAIT_S", "300"))
    platform = os.environ.get("JAX_PLATFORMS", "")
    err = None
    if platform == "axon":
        deadline = time.time() + wait_s
        while not _relay_up():
            if time.time() >= deadline:
                err = "tpu_unavailable"
                break
            _log(f"axon relay down; retrying ({deadline - time.time():.0f}s left)")
            time.sleep(15)
    import jax
    if err is None:
        try:
            return jax, jax.devices()[0], None
        except RuntimeError as e:  # relay answered TCP but backend init failed
            _log(f"backend init failed: {e}")
            err = "tpu_unavailable"
    jax.config.update("jax_platforms", "cpu")
    return jax, jax.devices("cpu")[0], err


# ---------------------------------------------------------------------------
# Vectorised host-NumPy baseline of the same math
# ---------------------------------------------------------------------------

def _np_layernorm(x, scale, bias, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * scale + bias


def _np_dense(x, p):
    return x @ np.asarray(p["kernel"]) + np.asarray(p["bias"])


def _np_point_encoder(params, pc, normals, nbr_idx):
    p = params["params"]
    nbrs = pc[nbr_idx]
    centred = nbrs - pc[:, None]
    dist = np.linalg.norm(centred, axis=-1, keepdims=True)
    ncos = np.sum(normals[nbr_idx] * normals[:, None], -1, keepdims=True)
    feat_in = np.concatenate([dist, ncos], -1)

    r_mean = nbrs.mean(-2, keepdims=True)
    l1, l2, l3 = r_mean - nbrs, nbrs - pc[:, None], pc[:, None] - r_mean
    n1 = np.linalg.norm(l1, axis=-1, keepdims=True)
    n2 = np.linalg.norm(l2, axis=-1, keepdims=True)
    n3 = np.broadcast_to(np.linalg.norm(l3, axis=-1, keepdims=True), n2.shape)
    rif = np.concatenate(
        [n1, n2, n3,
         (l1 * l2).sum(-1, keepdims=True) / (n1 * n2 + 1e-7),
         (l2 * l3).sum(-1, keepdims=True) / (n2 * n3 + 1e-7),
         (l3 * l1).sum(-1, keepdims=True) / (n3 * n1 + 1e-7)], -1)

    k = p["spconv0"]["kernel"]
    x = rif
    for i in range(4):
        x = np.maximum(_np_layernorm(_np_dense(x, k[f"lin{i}"]), k[f"ln{i}"]["scale"], k[f"ln{i}"]["bias"]), 0)
    kern = _np_dense(x, k["lin_out"])
    contracted = np.einsum("nkr,nki->nri", kern, feat_in).reshape(pc.shape[0], -1)
    out = _np_dense(contracted, p["spconv0"]["outnet"])
    out = _np_layernorm(out, p["spconv0"]["norm"]["scale"], p["spconv0"]["norm"]["bias"])
    tran = _np_dense(out, p["aggr0"]["linear"])
    glob = np.broadcast_to(tran.max(0, keepdims=True), tran.shape)
    return np.concatenate([out, glob], -1)


def _np_ppf_head(params, pc, normals, feat, idxs):
    p = params["params"]
    a, b = idxs[:, 0], idxs[:, 1]
    d = pc[a] - pc[b]
    dn = np.linalg.norm(d, axis=-1)
    du = d / (dn[:, None] + 1e-7)
    ppf = np.stack(
        [np.sum(normals[a] * du, -1), np.sum(normals[b] * du, -1),
         np.sum(normals[a] * normals[b], -1), dn], -1)
    x = np.concatenate([feat[a], feat[b], ppf], -1)
    for i in range(3):
        lp = p[f"res{i}"]
        skip = _np_dense(x, lp["fc0"]) if "fc0" in lp else x
        x = np.maximum(_np_dense(x, lp["fc1"]), 0)
        x = _np_dense(x, lp["fc2"]) + skip
    return _np_dense(x, p["final"])


def _np_vote_pipeline(pc, normals, preds, idxs, cfg, sphere, rng):
    """Vectorised NumPy center vote + backvote + rot vote + sphere binning."""
    B, R = cfg.tr_num_bins, cfg.rot_num_bins
    v0, v1 = cfg.vote_range
    n_rots = 72

    def softmax_sample(logits):
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        c = p.cumsum(-1)
        u = rng.uniform(size=(len(p), 1))
        return (u > c).sum(-1)

    tr_logits = preds[:, : 2 * B].reshape(-1, 2, B)
    proj = softmax_sample(tr_logits[:, 0]) / (B - 1) * 2 * v0 - v0
    odist = softmax_sample(tr_logits[:, 1]) / (B - 1) * v1

    a, b = pc[idxs[:, 0]], pc[idxs[:, 1]]
    ab = a - b
    abl = np.linalg.norm(ab, axis=-1)
    good = abl > 1e-7
    abu = ab / (abl + 1e-7)[:, None]
    co = np.stack([np.zeros_like(abu[:, 0]), -abu[:, 2], abu[:, 1]], -1)
    alt = np.stack([-abu[:, 1], abu[:, 0], np.zeros_like(abu[:, 0])], -1)
    co = np.where((np.linalg.norm(co, axis=-1) < 1e-7)[:, None], alt, co)
    co /= (np.linalg.norm(co, axis=-1) + 1e-7)[:, None]
    c = a - abu * proj[:, None]
    x = co * odist[:, None]
    y = np.cross(x, abu)
    ang = np.arange(n_rots) * 2 * np.pi / n_rots
    centers = (c[:, None] + np.cos(ang)[None, :, None] * x[:, None]
               + np.sin(ang)[None, :, None] * y[:, None])

    corner = pc.min(0)
    dims = ((pc.max(0) - corner) / cfg.res).astype(np.int32) + 1
    g = (centers - corner) / cfg.res
    ok = good[:, None] & np.all((g >= 0.01) & (g < dims - 1.01), -1)
    f = np.floor(g).astype(np.int64)
    r = g - f
    grid = np.zeros(tuple(dims), np.float32)
    gyz, gz = dims[1] * dims[2], dims[2]
    base = (f[..., 0] * dims[1] + f[..., 1]) * dims[2] + f[..., 2]
    w = ok.astype(np.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                wc = (np.where(dx, r[..., 0], 1 - r[..., 0])
                      * np.where(dy, r[..., 1], 1 - r[..., 1])
                      * np.where(dz, r[..., 2], 1 - r[..., 2]) * w)
                ids = np.clip(base + dx * gyz + dy * gz + dz, 0, grid.size - 1)
                np.add.at(grid.reshape(-1), ids.reshape(-1), wc.reshape(-1))
    T_est = corner + np.array(np.unravel_index(grid.argmax(), grid.shape)) * cfg.res

    # backvote
    near = np.linalg.norm(centers - T_est, axis=-1) <= 3 * cfg.res
    mask = (near & ok).any(-1)

    # rot vote + sphere binning on 10k subsample
    up_logits = preds[:, 2 * B : 2 * B + R]
    angles = softmax_sample(up_logits) / (R - 1) * np.pi
    keep = np.where(mask)[0]
    sub = keep[rng.integers(0, len(keep), min(10000, len(keep)))]
    t = np.tan(angles[sub])
    offs = (np.cos(ang)[None, :, None] * co[sub][:, None]
            + np.sin(ang)[None, :, None] * np.cross(co[sub], abu[sub])[:, None])
    up = t[:, None, None] * offs + np.where(t > 0, 1, -1)[:, None, None] * abu[sub][:, None]
    up /= np.linalg.norm(up, axis=-1, keepdims=True) + 1e-7
    cos = up.reshape(-1, 3) @ sphere.T
    counts = (cos > np.cos(np.deg2rad(1.5))).sum(0)
    best = sphere[counts.argmax()]
    return T_est, best


def run_bench(jax, dev, on_cpu: bool, overrides=None):
    import jax.numpy as jnp

    from cppf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from cppf_tpu.config import load_config
    from cppf_tpu.data.synthetic import PRIMITIVES, sample_surface
    from cppf_tpu.ops.knn import knn_indices
    from cppf_tpu.pipeline.pose import PoseConfig, estimate_pose, make_models
    from cppf_tpu.pipeline.preprocess import preprocess_cloud

    _log(f"device: {dev}")
    cfg = load_config("bottle", overrides=overrides)
    rng = np.random.default_rng(0)
    N_PAIRS = 100000

    pc_cam = sample_surface(PRIMITIVES["bottle"](), 8000, rng) + np.float32([0.1, -0.05, 0.7])
    pad = np.zeros((8192, 3), np.float32)
    pad[:8000] = pc_cam
    pre = preprocess_cloud(jax.random.PRNGKey(0), jnp.array(pad), 8000, cfg.res,
                           npoint_pad=4096, knn=cfg.knn)
    n = int(pre.n_valid)

    pcfg = PoseConfig.from_config(cfg, n_pairs=N_PAIRS)
    point_enc, ppf_enc = make_models(cfg)
    nbr = pre.nbr_idx
    # use the trained checkpoint when present: production inference runs
    # trained networks whose votes concentrate at the center — the workload
    # the pipeline (esp. branch-and-bound center voting) is designed for.
    try:
        from cppf_tpu.train.checkpoints import load_params

        params = load_params("checkpoints/bottle", name="params_best")
        p_pt, p_pf = params["point"], params["ppf"]
        _log("using trained checkpoint: checkpoints/bottle")
    except Exception as e:  # pragma: no cover - environment-dependent
        _log(f"no trained checkpoint ({e}); falling back to random init")
        p_pt = point_enc.init(jax.random.PRNGKey(1), pre.pc, pre.normals, nbr)
        feat = point_enc.apply(p_pt, pre.pc, pre.normals, nbr)
        p_pf = ppf_enc.init(jax.random.PRNGKey(2), pre.pc, pre.normals, feat,
                            jnp.zeros((8, 2), jnp.int32))
    sphere = jnp.array(pcfg.sphere_points())

    # --- ours: full pipeline on the accelerator -----------------------------
    def dispatch(i, mode_cfg):
        return estimate_pose(jax.random.PRNGKey(10 + i), p_pt, p_pf, pre.pc,
                             pre.normals, pre.n_valid, sphere, mode_cfg,
                             nbr_idx=pre.nbr_idx)

    def measure(mode_cfg, tag, iters=20 if not on_cpu else 3):
        t0 = time.time()
        jax.block_until_ready(dispatch(0, mode_cfg).T)
        _log(f"{tag} compile+first run: {time.time() - t0:.1f}s")
        # throughput: pipelined dispatch (the production regime — drivers
        # stream instances; device executes in order, so blocking on the
        # last output waits for all)
        t0 = time.time()
        outs = [dispatch(i, mode_cfg) for i in range(1, iters + 1)]
        jax.block_until_ready(outs[-1].T)
        dt = (time.time() - t0) / iters
        # latency: single blocked call (interactive regime; on this setup it
        # is dominated by the remote-device RPC round-trip, not compute)
        lats = []
        for i in range(3):
            t0 = time.time()
            jax.block_until_ready(dispatch(100 + i, mode_cfg).T)
            lats.append(time.time() - t0)
        lat = sorted(lats)[1]
        _log(f"{tag}: {dt * 1000:.1f} ms/pose ({N_PAIRS / dt:,.0f} pairs/s), "
             f"{lat * 1000:.1f} ms single-call latency")
        return dt, lat

    fast_cfg = PoseConfig(**{**pcfg.__dict__, "splat": "nearest"})
    dt, lat_fast = measure(fast_cfg, "fast (nearest splat)")
    dt_parity, lat_parity = measure(pcfg, "parity (trilinear splat)")
    ours_pps = N_PAIRS / dt

    # --- batched production mode (estimate_pose_batch at B=4, the regime the
    # NOCS/SUN drivers run — one jitted program per frame's crops) ----------
    batched_ms = None
    if not on_cpu:  # B=4 full-pipeline compile is minutes on CPU; skip there
        try:
            from cppf_tpu.pipeline.pose import estimate_pose_batch
            from cppf_tpu.pipeline.preprocess import preprocess_cloud_batch

            B = 4
            pads_b = jnp.broadcast_to(jnp.array(pad), (B, *pad.shape))
            keys = jax.random.split(jax.random.PRNGKey(3), 2 * B)
            pre_b = preprocess_cloud_batch(
                keys[:B], pads_b, jnp.full((B,), 8000, jnp.int32), cfg.res,
                npoint_pad=4096, knn=cfg.knn)

            def dispatch_b(i):
                ks = jax.random.split(jax.random.PRNGKey(200 + i), B)
                return estimate_pose_batch(ks, p_pt, p_pf, pre_b.pc,
                                           pre_b.normals, pre_b.n_valid,
                                           sphere, fast_cfg,
                                           nbr_idxs=pre_b.nbr_idx)

            t0 = time.time()
            jax.block_until_ready(dispatch_b(0).T)
            _log(f"batched B={B} compile+first run: {time.time() - t0:.1f}s")
            iters = 8
            t0 = time.time()
            outs = [dispatch_b(i) for i in range(1, iters + 1)]
            jax.block_until_ready(outs[-1].T)
            batched_ms = (time.time() - t0) / (iters * B) * 1000
            _log(f"batched: {batched_ms:.2f} ms/pose at B={B}")
        except Exception as e:  # pragma: no cover - keep the artifact alive
            _log(f"batched measurement failed (non-fatal): {e}")

    # --- baseline: vectorised NumPy on host ---------------------------------
    BASE_PAIRS = 20000
    pc_np = np.asarray(pre.pc)[:n]
    nrm_np = np.asarray(pre.normals)[:n]
    sphere_np = np.asarray(sphere)
    idxs = rng.integers(0, n, size=(BASE_PAIRS, 2))
    t0 = time.time()
    d2 = ((pc_np[:, None] - pc_np[None]) ** 2).sum(-1)
    nbr_np = np.argpartition(d2, cfg.knn, axis=-1)[:, : cfg.knn]
    feat_np = _np_point_encoder(p_pt, pc_np, nrm_np, nbr_np)
    preds_np = _np_ppf_head(p_pf, pc_np, nrm_np, feat_np, idxs)
    _np_vote_pipeline(pc_np, nrm_np, preds_np, idxs, cfg, sphere_np, rng)
    base_dt = time.time() - t0
    base_pps = BASE_PAIRS / base_dt
    _log(f"numpy host baseline: {base_dt * 1000:.1f} ms @ {BASE_PAIRS} pairs, {base_pps:,.0f} pairs/s")

    return {
        "metric": "point-pairs/sec, full 9D pose pipeline (network+voting)",
        "value": round(ours_pps, 1),
        "unit": "pairs/s",
        "vs_baseline": round(ours_pps / base_pps, 2),
        "ms_per_pose": round(dt * 1000, 2),
        "ms_per_pose_reference_exact_splat": round(dt_parity * 1000, 2),
        "batched_ms_per_pose": None if batched_ms is None else round(batched_ms, 2),
        "single_call_latency_ms": round(lat_fast * 1000, 2),
        "single_call_latency_ms_exact_splat": round(lat_parity * 1000, 2),
        "splat_equiv_adds_per_s": round(N_PAIRS * pcfg.num_rots * 8 / dt_parity, 1),
        "n_pairs": N_PAIRS,
        "n_points": n,
        "baseline": "vectorized host-NumPy of the same workload (reference CuPy path not runnable here; reference publishes no numbers)",
        "baseline_pairs_per_s": round(base_pps, 1),
        "device": str(dev),
    }


def main():
    record = {
        "metric": "point-pairs/sec, full 9D pose pipeline (network+voting)",
        "value": 0.0,
        "unit": "pairs/s",
        "vs_baseline": 0.0,
        "device": None,
        "error": None,
    }
    try:
        from cppf_tpu.config import parse_cli_overrides

        overrides = parse_cli_overrides(sys.argv[1:])  # e.g. pose_f32=decode
        jax, dev, err = _acquire_device()
        on_cpu = dev.platform == "cpu"
        record.update(run_bench(jax, dev, on_cpu, overrides=overrides or None))
        record["error"] = err
        if err:
            record["device"] = f"{dev} (CPU fallback — TPU relay unavailable)"
    except Exception as e:  # pragma: no cover - the artifact must survive
        import traceback

        traceback.print_exc(file=sys.stderr)
        record["error"] = record["error"] or f"{type(e).__name__}: {e}"
    print(json.dumps(record))
    # Non-zero exit only when NO measurement happened at all; a labeled CPU
    # fallback is a valid (if degraded) record.
    sys.exit(0 if record["value"] else 1)


if __name__ == "__main__":
    main()
