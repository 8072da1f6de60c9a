from .tableaus import (
    Tableau, get_tableau, TABLEAUS, EULER, MIDPOINT, HEUN, RK4, TSIT5, DOPRI5,
)
from .integrate import odeint, odeint_grid, solve_stats
from .neural_ode import NeuralGraphODE, diffeqsol_to_array

__all__ = [
    "Tableau", "get_tableau", "TABLEAUS", "EULER", "MIDPOINT", "HEUN", "RK4",
    "TSIT5", "DOPRI5", "odeint", "odeint_grid", "solve_stats", "NeuralGraphODE",
    "diffeqsol_to_array",
]
