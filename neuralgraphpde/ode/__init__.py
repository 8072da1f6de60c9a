from .tableaus import (
    Tableau, get_tableau, TABLEAUS, EULER, MIDPOINT, HEUN, RK4, TSIT5, DOPRI5,
)
from .integrate import odeint, odeint_grid
from .neural_ode import NeuralGraphODE, diffeqsol_to_array

__all__ = [
    "Tableau", "get_tableau", "TABLEAUS", "EULER", "MIDPOINT", "HEUN", "RK4",
    "TSIT5", "DOPRI5", "odeint", "odeint_grid", "NeuralGraphODE",
    "diffeqsol_to_array",
]
