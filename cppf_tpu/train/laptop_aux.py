"""Laptop-aux segmenter training (equivalent of reference
``train_laptop_aux.py``): FCN-ResNet50 with InstanceNorm, cross-entropy with
−100 ignore labels, Adam(lr 1e-3, wd 0), checkpoint every epoch.

Usage:
    python -m cppf_tpu.train.laptop_aux [max_epoch=20] [batch_size=16] [out_dir=...]
"""
from __future__ import annotations

import logging
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cppf_tpu.config import parse_cli_overrides
from cppf_tpu.data.laptop_aux import LaptopAuxDataset
from cppf_tpu.models.segmenter import FCNResNet50
from cppf_tpu.train import checkpoints
from cppf_tpu.utils.meters import AverageMeter

log = logging.getLogger("cppf_tpu.laptop_aux")


def ce_ignore_loss(logits, labels):
    """Cross entropy with ignore_index=-100 (reference train_laptop_aux.py:30,46)."""
    valid = labels >= 0
    safe = jnp.maximum(labels, 0)
    logp = jax.nn.log_softmax(logits, -1)
    nll = -jnp.take_along_axis(logp, safe[..., None], -1)[..., 0]
    return jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(jnp.sum(valid), 1)


@partial(jax.jit, static_argnames=("tx",), donate_argnums=(0, 1))
def seg_train_step(params, opt_state, rng, rgb, labels, tx):
    model = FCNResNet50(num_classes=2)

    def loss_fn(p):
        logits = model.apply(p, rgb, train=True, rngs={"dropout": rng})
        return ce_ignore_loss(logits, labels)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


def train(max_epoch: int = 20, batch_size: int = 16, out_dir: str = "checkpoints/laptop_aux",
          lr: float = 1e-3, epoch_len: int = 200, data_root: str = "./data/laptop",
          seed: int = 0):
    os.makedirs(out_dir, exist_ok=True)
    ds = LaptopAuxDataset(data_root=data_root, seed=seed, epoch_len=epoch_len)
    model = FCNResNet50(num_classes=2)
    rng = jax.random.PRNGKey(seed)
    params = model.init(rng, jnp.zeros((1, 224, 224, 3)))
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    for epoch in range(max_epoch):
        meter = AverageMeter()
        t0 = time.time()
        steps = max(1, epoch_len // batch_size)
        for _ in range(steps):
            rgbs, labels = zip(*[ds.sample() for _ in range(batch_size)])
            rng, rd = jax.random.split(rng)
            params, opt_state, loss = seg_train_step(
                params, opt_state, rd, jnp.asarray(np.stack(rgbs)),
                jnp.asarray(np.stack(labels)), tx,
            )
            meter.update(float(loss))
        log.info("epoch %d loss %.4f (%.1fs)", epoch, meter.avg, time.time() - t0)
        checkpoints.save_params(out_dir, params, name="params_best")
    return params


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="[%(asctime)s][%(name)s] %(message)s", force=True)
    overrides = parse_cli_overrides([a for a in (argv or sys.argv[1:]) if "=" in a])
    train(
        max_epoch=int(overrides.get("max_epoch", 20)),
        batch_size=int(overrides.get("batch_size", 16)),
        out_dir=overrides.get("out_dir", "checkpoints/laptop_aux"),
        lr=float(overrides.get("lr", 1e-3)),
        epoch_len=int(overrides.get("epoch_len", 200)),
        data_root=overrides.get("data_root", "./data/laptop"),
    )


if __name__ == "__main__":
    main()
