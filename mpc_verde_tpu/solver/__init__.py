from .boxqp import solve_boxqp
from .ilqr import ILQROptions, ILQRResult, make_ilqr_solver
