"""Multi-host runtime helpers (parallel/multihost.py), single-process mode.

A real pod is unavailable in CI; these tests pin the behavior that does not
need one: the single-host no-op contract of ``initialize_from_env`` and the
sharding/value semantics of ``local_batch_to_global`` on the virtual
8-device CPU mesh (single process owns all devices, so the process-local
data is the full batch — the same call sites work unchanged on a pod).
"""

from __future__ import annotations

import numpy as np
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
