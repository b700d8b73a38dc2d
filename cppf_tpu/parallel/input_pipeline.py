"""Multi-host input sharding (SURVEY §7 step 8).

On a multi-host TPU pod each process renders a disjoint shard of the sample
stream (DCN never carries training arrays — only the per-host data loading is
partitioned; the gradient all-reduce rides ICI inside jit).  Single-host runs
degrade to the identity.
"""
from __future__ import annotations

from typing import Iterator, Sequence

import jax


def host_shard(items: Sequence, process_index: int | None = None,
               process_count: int | None = None) -> list:
    """Static round-robin shard of a sample/model-name list for this host."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return list(items[pi::pc])


def shard_dataset(dataset, seed: int = 0, process_index: int | None = None,
                  process_count: int | None = None):
    """Partition a render dataset across pod hosts, in place: each process
    gets a disjoint shard of the model list and a decorrelated RNG (DCN
    never carries arrays — only the sample stream is split).  Identity on a
    single host.  ``cppf_tpu.train.loop.train`` applies this automatically.
    """
    import numpy as np

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    # reseed before the single-host early return so ``seed`` is honoured
    # deterministically regardless of process count
    dataset.rng = np.random.default_rng(seed * 1000003 + pi)
    if pc <= 1:
        return dataset
    if getattr(dataset, "model_names", None):
        dataset.model_names = host_shard(dataset.model_names, pi, pc)
    return dataset


def sharded_sample_stream(dataset, seed: int = 0) -> Iterator:
    """Per-host independent sample stream: fold the process index into the
    dataset RNG so hosts render disjoint random poses."""
    shard_dataset(dataset, seed)
    while True:
        yield dataset.sample()


def global_batch_size(per_host_batch: int) -> int:
    return per_host_batch * jax.process_count()
