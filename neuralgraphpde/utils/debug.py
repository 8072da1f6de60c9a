"""Numerical-safety utilities (SURVEY §5.2): NaN/Inf guards for training
loops and kernel-path validation helpers (the rebuild's analog of the
reference's ``CUDA.allowscalar(false)`` + assert guards)."""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def check_finite(tree: Any, name: str = "value") -> Any:
    """Raise inside jit (via checkify-style debug callback) if any leaf is
    non-finite. Returns the tree unchanged so it composes inline."""
    def guard(leaf):
        bad = jnp.logical_not(jnp.all(jnp.isfinite(leaf)))
        def report(b):
            if b:
                raise FloatingPointError(f"non-finite values in {name}")
        jax.debug.callback(report, bad)
        return leaf

    return jax.tree_util.tree_map(guard, tree)


def finite_or_zero(tree: Any) -> Any:
    """Replace non-finite leaves elementwise with zero (gradient clipping's
    blunt cousin — useful to survive a bad adaptive-solver step)."""
    return jax.tree_util.tree_map(
        lambda l: jnp.where(jnp.isfinite(l), l, 0.0), tree)


def wrap_nan_debug(fn: Callable, name: str = "fn") -> Callable:
    """Wrap a function so its output is finiteness-checked under jit."""
    def wrapped(*args, **kwargs):
        out = fn(*args, **kwargs)
        return check_finite(out, name=name)

    return wrapped


def global_norm(tree: Any) -> jax.Array:
    return jnp.sqrt(sum(jnp.sum(l.astype(jnp.float32) ** 2)
                        for l in jax.tree_util.tree_leaves(tree)))
