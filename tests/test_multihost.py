"""Multi-host runtime helpers (parallel/multihost.py), single-process mode.

A real pod is unavailable in CI; these tests pin the behavior that does not
need one: the single-host no-op contract of ``initialize_from_env`` and the
sharding/value semantics of ``local_batch_to_global`` on the virtual
8-device CPU mesh (single process owns all devices, so the process-local
data is the full batch — the same call sites work unchanged on a pod).
"""

from __future__ import annotations

import numpy as np
import pytest
import jax
from jax.sharding import Mesh, PartitionSpec as P

from gnn_tracking_tpu.parallel.multihost import (
    initialize_from_env,
    local_batch_to_global,
)


def test_initialize_single_process_noop(monkeypatch):
    monkeypatch.setenv("SLURM_NTASKS", "1")
    assert initialize_from_env() is False


def test_initialize_explicit_single_process():
    assert initialize_from_env(num_processes=1) is False


def test_local_batch_to_global_shards_leading_axis():
    devs = np.array(jax.devices()).reshape(8)
    mesh = Mesh(devs, ("data",))
    batch = {
        "x": np.arange(8 * 6 * 3, dtype=np.float32).reshape(8, 6, 3),
        "y": np.arange(8, dtype=np.int32),
    }
    out = local_batch_to_global(batch, mesh)
    for key, val in batch.items():
        arr = out[key]
        assert arr.shape == val.shape
        np.testing.assert_array_equal(np.asarray(arr), val)
        # leading axis sharded over the data axis: one shard per device
        assert len(arr.addressable_shards) == 8
        assert arr.addressable_shards[0].data.shape[0] == val.shape[0] // 8

    # a jitted psum-style reduction consumes the global array directly
    total = jax.jit(lambda b: jax.tree.map(lambda a: a.sum(), b))(out)
    assert float(total["y"]) == float(batch["y"].sum())


# ----------------------------------------------------------------------
# real two-process jax.distributed execution (subprocess-based)
# ----------------------------------------------------------------------


def _run_worker(pid, nproc, port, out, env):
    import subprocess
    import sys as _sys
    import pathlib

    worker = pathlib.Path(__file__).parent / "_multihost_worker.py"
    return subprocess.Popen(
        [
            _sys.executable, str(worker),
            "--pid", str(pid), "--nproc", str(nproc),
            "--port", str(port), "--out", out,
        ],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
    )


@pytest.mark.slow
def test_two_process_distributed_matches_single_process(tmp_path):
    """Spawn 2 local processes wired by ``jax.distributed`` (coordinator on
    localhost), each owning 4 virtual CPU devices and loading only its own
    events; the DP train step over the resulting 8-device global mesh must
    reproduce the single-process 8-device run bit-for-bit (loss + updated
    parameter fingerprint). This exercises ``multihost.initialize_from_env``
    with ``process_count=2`` — the reference's Lightning-DDP boundary
    (SURVEY §5.8) in correctness form."""
    import json
    import os
    import socket
    import subprocess

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_PROCESSES")
    }

    # single-process reference arm (8 local devices)
    sp_out = str(tmp_path / "sp.json")
    proc = _run_worker(0, 1, 0, sp_out, env)
    out, _ = proc.communicate(timeout=600)
    assert proc.returncode == 0, out.decode()[-3000:]
    ref = json.loads(open(sp_out).read())
    assert ref["process_count"] == 1

    # pick a free coordinator port
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    mp_out = str(tmp_path / "mp.json")
    procs = [_run_worker(i, 2, port, mp_out, env) for i in range(2)]
    outs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(o)
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o.decode()[-3000:]

    got = json.loads(open(mp_out).read())
    assert got["process_count"] == 2
    assert got["device_count"] == 8
    assert got["loss"] == pytest.approx(ref["loss"], rel=1e-9)
    assert got["fingerprint"] == pytest.approx(ref["fingerprint"], rel=1e-9)
