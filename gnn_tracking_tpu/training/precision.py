"""Mixed-precision policies for TPU training.

The reference trains in fp32 (torch defaults, with ``torch.compile`` on the
loss). On TPU, the MXU's native precision is bfloat16: running the model
compute in bf16 with fp32 parameters/optimizer state and fp32 loss
accumulation roughly doubles matmul throughput and halves activation HBM
traffic at negligible accuracy cost for these shallow GNNs (the eps-clipped
sigmoids and arctanh in the losses stay fp32).

Usage::

    module = TCModule(model=..., loss_fct=..., precision="bf16")
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """What dtype to use where."""

    param_dtype: jnp.dtype
    compute_dtype: jnp.dtype
    output_dtype: jnp.dtype

    def cast_to_compute(self, tree):
        return jax.tree.map(
            lambda v: v.astype(self.compute_dtype)
            if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating)
            else v,
            tree,
        )

    def cast_to_output(self, tree):
        return jax.tree.map(
            lambda v: v.astype(self.output_dtype)
            if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating)
            else v,
            tree,
        )


POLICIES = {
    "f32": Policy(jnp.float32, jnp.float32, jnp.float32),
    "bf16": Policy(jnp.float32, jnp.bfloat16, jnp.float32),
    "full_bf16": Policy(jnp.bfloat16, jnp.bfloat16, jnp.float32),
}


def get_policy(name: str) -> Policy:
    if name not in POLICIES:
        msg = f"Unknown precision policy {name!r}; choose from {sorted(POLICIES)}"
        raise ValueError(msg)
    return POLICIES[name]
