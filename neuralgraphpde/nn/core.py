"""Explicit-parameter layer protocol (Lux-style) for JAX.

The reference is built on Lux.jl's explicit params/state protocol: every layer
is an immutable description; ``setup(rng, layer)`` materializes a params pytree
``ps`` and a state pytree ``st``; the forward is a pure
``y, st = layer(x, ps, st)`` (reference src/layers.jl:5-34, SURVEY §1 L2).
That purity is exactly what a jitted ODE right-hand side needs, so we keep the
protocol rather than adopting flax's implicit module state.

Layers are frozen dataclasses (hashable static config, safe to close over in
``jax.jit``); ``ps``/``st`` are plain nested dicts (pytrees).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax

Params = Dict[str, Any]
State = Dict[str, Any]


class Layer:
    """Base explicit layer (equivalent of Lux ``AbstractExplicitLayer``,
    consumed by the reference at src/layers.jl:5)."""

    def initialparameters(self, rng: jax.Array) -> Params:
        return {}

    def initialstates(self, rng: jax.Array) -> State:
        return {}

    def parameterlength(self) -> int:
        rng = jax.random.PRNGKey(0)
        return sum(x.size for x in jax.tree_util.tree_leaves(
            jax.eval_shape(self.initialparameters, rng)))

    def statelength(self) -> int:
        return len(jax.tree_util.tree_leaves(
            self.initialstates(jax.random.PRNGKey(0))))

    def __call__(self, x, ps: Params, st: State) -> Tuple[Any, State]:
        raise NotImplementedError


class ContainerLayer(Layer):
    """A layer wrapping named sub-layers (Lux ``AbstractExplicitContainerLayer``).

    Subclasses set ``layer_names`` to the tuple of dataclass-field names that
    hold sub-layers. Mirroring Lux semantics (reference src/layers.jl:12):
    with a single sub-layer the child's parameters are *flattened* into this
    layer's params (the reference's ``ExplicitEdgeConv`` passes its whole
    ``ps`` to ϕ, src/layers.jl:106); with several they are nested per name
    (``ps['ϕ'], ps['γ']``, src/layers.jl:316,328). States are always nested.
    """

    layer_names: Tuple[str, ...] = ()

    def _children(self):
        return {name: getattr(self, name) for name in self.layer_names}

    def initialparameters(self, rng: jax.Array) -> Params:
        children = self._children()
        keys = jax.random.split(rng, max(len(children), 1))
        if len(children) == 1:
            (child,) = children.values()
            return child.initialparameters(keys[0])
        return {
            name: child.initialparameters(k)
            for (name, child), k in zip(children.items(), keys)
        }

    def child_params(self, name: str, ps: Params) -> Params:
        """Resolve a sub-layer's params respecting single-child flattening."""
        return ps if len(self.layer_names) == 1 else ps[name]

    def initialstates(self, rng: jax.Array) -> State:
        children = self._children()
        keys = jax.random.split(rng, max(len(children), 1))
        return {
            name: child.initialstates(k)
            for (name, child), k in zip(children.items(), keys)
        }

    def statelength(self) -> int:
        return sum(c.statelength() for c in self._children().values())


def setup(rng: jax.Array, layer: Layer) -> Tuple[Params, State]:
    """Materialize ``(ps, st)`` — the equivalent of ``Lux.setup`` (reference
    call stack SURVEY §3.1)."""
    p_rng, s_rng = jax.random.split(rng)
    return layer.initialparameters(p_rng), layer.initialstates(s_rng)


def apply(layer: Layer, x, ps: Params, st: State) -> Tuple[Any, State]:
    return layer(x, ps, st)


# Convenience: frozen-dataclass decorator used by all concrete layers.
def layerclass(cls):
    return dataclasses.dataclass(frozen=True, eq=False)(cls)
