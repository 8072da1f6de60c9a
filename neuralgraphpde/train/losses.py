"""Loss functions: masked softmax cross-entropy (node classification,
reference docs/src/tutorials/graph_node.md:98-105) and rollout MSE (PDE
training, VMH.md:105-109)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_cross_entropy(logits: jax.Array, labels: jax.Array,
                         mask: jax.Array) -> jax.Array:
    """logits (N, C), integer labels (N,), boolean mask (N,)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                             axis=-1)[:, 0]
    mask = mask.astype(logits.dtype)
    return -jnp.sum(ll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def accuracy(logits: jax.Array, labels: jax.Array,
             mask: jax.Array) -> jax.Array:
    pred = jnp.argmax(logits, axis=-1)
    hit = (pred == labels).astype(jnp.float32) * mask.astype(jnp.float32)
    return jnp.sum(hit) / jnp.maximum(jnp.sum(mask), 1.0)


def mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean((pred - target) ** 2)


def rollout_mse(pred_traj: jax.Array, target_traj: jax.Array) -> jax.Array:
    """Mean squared error over a full (T, ...) rollout."""
    return jnp.mean((pred_traj - target_traj) ** 2)
