from .grand import grand_model
from .vmh import vmh_model
from .mppde import MPPDESolver
from .gno import GNOModel

__all__ = ["grand_model", "vmh_model", "MPPDESolver", "GNOModel"]
