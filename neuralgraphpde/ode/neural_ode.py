"""NeuralGraphODE: a GNN as the right-hand side of a continuous-time ODE.

The reference keeps this layer in its *tutorials* (a Lux container built
around ``ODEProblem`` + ``solve``, reference docs/src/tutorials/
graph_node.md:44-72 and DiffEqFlux.NeuralODE in VMH.md:72-90); here it is
real library code (SURVEY §1 L4 requires promotion). The wrapped model's
state (graph included) is closed over by the RHS exactly like the tutorial's
``dudt(u, p, t)`` closure, and the full solve is one XLA program.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn.core import ContainerLayer, Layer
from .integrate import odeint, odeint_grid
from .tableaus import get_tableau


@dataclasses.dataclass(frozen=True, eq=False)
class NeuralGraphODE(ContainerLayer):
    """Solve ``du/dt = model(u)`` over ``tspan``.

    Returns the solution stacked on a leading time axis ``(T, *u.shape)``
    (``output='all'``) or just the final state (``output='last'``).

    Adjoints: ``'checkpoint'`` — adaptive solver + checkpointed discrete
    adjoint (stable on dissipative dynamics; the reference's
    InterpolatingAdjoint analog, graph_node.md:54-66); ``'backsolve'`` —
    adaptive solver + continuous backsolve adjoint (O(1) memory, unstable on
    stiff/diffusive RHS over long spans); ``'grid'`` — fixed
    ``steps_per_interval`` grid with per-step rematerialization.
    """

    model: Layer
    tspan: Tuple[float, float] = (0.0, 1.0)
    solver: str = "tsit5"
    saveat: Optional[Tuple[float, ...]] = None
    rtol: float = 1e-6
    atol: float = 1e-6
    max_steps: int = 10_000
    # Default changed round 3 (was 'backsolve'): the continuous backsolve
    # adjoint is exponentially unstable on dissipative dynamics — i.e. the
    # diffusion PDEs this framework targets. 'checkpoint' is stable and is
    # the analog of the reference tutorials' InterpolatingAdjoint
    # (graph_node.md:54-66). Opt back in with adjoint='backsolve' for
    # O(1)-memory training on non-stiff dynamics.
    adjoint: str = "checkpoint"
    # 'hermite' = free stepping + dense-output saves (DiffEq saveat
    # semantics, no forced step endpoints — right for dense rollout
    # training); 'tstop' = steps clamped to land on each save point.
    interpolation: str = "hermite"
    steps_per_interval: int = 8
    checkpoint_steps: int = 128
    output: str = "all"
    layer_names: Tuple[str, ...] = ("model",)

    def _ts(self, dtype):
        if self.saveat is not None:
            return jnp.asarray(self.saveat, dtype=dtype)
        return jnp.asarray(self.tspan, dtype=dtype)

    def __call__(self, x, ps, st):
        model_st = st["model"]

        def rhs(t, u, p):
            du, _ = self.model(u, p, model_st)
            return du

        ts = self._ts(x.dtype if hasattr(x, "dtype") else jnp.float32)
        if self.adjoint == "grid" or not get_tableau(self.solver).adaptive:
            ys = odeint_grid(rhs, x, ts, ps, solver=self.solver,
                             steps_per_interval=self.steps_per_interval)
        else:
            ys = odeint(rhs, x, ts, ps, solver=self.solver, rtol=self.rtol,
                        atol=self.atol, max_steps=self.max_steps,
                        interpolation=self.interpolation,
                        adjoint=self.adjoint,
                        checkpoint_steps=self.checkpoint_steps)
        if self.output == "last":
            ys = jax.tree_util.tree_map(lambda l: l[-1], ys)
        return ys, st


def diffeqsol_to_array(sol):
    """Tutorial helper (reference docs/src/tutorials/graph_node.md:68-71):
    reduce a stacked solution to its final time point."""
    return jax.tree_util.tree_map(lambda l: l[-1], sol)
