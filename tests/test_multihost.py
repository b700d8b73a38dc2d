"""Two-process multi-host input-pipeline test.

Spawns two REAL Python processes joined through ``jax.distributed.initialize``
(CPU backend, local coordinator), so ``shard_dataset``'s default
``jax.process_index()``/``jax.process_count()`` wiring is exercised exactly as
on a TPU pod — not with explicitly passed (pi, pc) args like the unit tests.
The reference has no distributed code at all (SURVEY §2 parallelism
statement); this guards our multi-host extension.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)
assert jax.process_index() == pid and jax.process_count() == nproc

from cppf_tpu.parallel.input_pipeline import shard_dataset

class _DS:
    model_names = [f"model_{i:02d}" for i in range(11)]
    rng = None

ds = shard_dataset(_DS(), seed=7)  # no explicit (pi, pc): real wiring
draws = ds.rng.integers(0, 1_000_000, size=4).tolist()
print("RESULT " + json.dumps({"pid": pid, "names": ds.model_names,
                              "draws": draws}))
"""


def test_two_process_shard_dataset(tmp_path):
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i), "2", port],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         env=env, cwd="/root/repo", text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=180)
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
        outs.append(json.loads(line[len("RESULT "):]))

    by_pid = {o["pid"]: o for o in outs}
    names0, names1 = by_pid[0]["names"], by_pid[1]["names"]
    # disjoint shards whose union is the full model list (round-robin)
    assert set(names0) & set(names1) == set()
    assert sorted(names0 + names1) == [f"model_{i:02d}" for i in range(11)]
    assert abs(len(names0) - len(names1)) <= 1
    # decorrelated per-host RNG streams
    assert by_pid[0]["draws"] != by_pid[1]["draws"]
