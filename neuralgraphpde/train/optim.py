"""Optimizers: optax wrappers plus Rprop (used by the reference's VMH
tutorial, docs/src/tutorials/VMH.md:97; not in optax, implemented here as a
GradientTransformation)."""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def adam(learning_rate: float = 1e-2, **kwargs) -> optax.GradientTransformation:
    return optax.adam(learning_rate, **kwargs)


class RpropState(NamedTuple):
    step_sizes: optax.Params
    prev_grads: optax.Params


def rprop(
    learning_rate: float = 1e-3,
    eta_minus: float = 0.5,
    eta_plus: float = 1.2,
    step_min: float = 1e-8,
    step_max: float = 50.0,
) -> optax.GradientTransformation:
    """Rprop- (resilient backprop, sign-based per-parameter step adaptation)."""

    def init_fn(params):
        return RpropState(
            step_sizes=jax.tree_util.tree_map(
                lambda p: jnp.full_like(p, learning_rate), params),
            prev_grads=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update_fn(grads, state, params=None):
        def per_leaf(g, prev_g, eta):
            sign = g * prev_g
            eta_new = jnp.where(
                sign > 0, jnp.minimum(eta * eta_plus, step_max),
                jnp.where(sign < 0, jnp.maximum(eta * eta_minus, step_min),
                          eta))
            # Rprop-: on sign change, zero the gradient for this step
            g_eff = jnp.where(sign < 0, 0.0, g)
            update = -jnp.sign(g_eff) * eta_new
            return update, eta_new, g_eff

        flat = jax.tree_util.tree_map(
            per_leaf, grads, state.prev_grads, state.step_sizes)
        updates = jax.tree_util.tree_map(lambda t: t[0], flat,
                                         is_leaf=lambda t: isinstance(t, tuple))
        etas = jax.tree_util.tree_map(lambda t: t[1], flat,
                                      is_leaf=lambda t: isinstance(t, tuple))
        prevs = jax.tree_util.tree_map(lambda t: t[2], flat,
                                       is_leaf=lambda t: isinstance(t, tuple))
        return updates, RpropState(step_sizes=etas, prev_grads=prevs)

    return optax.GradientTransformation(init_fn, update_fn)
