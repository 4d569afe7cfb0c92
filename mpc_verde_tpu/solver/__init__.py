from .boxqp import solve_boxqp
from .ilqr import ILQROptions, ILQRResult, make_ilqr_solver
from .batched import make_batched_ilqr_solver, make_drained_solver
from .streaming import make_streaming_solver
from .ipm import make_barrier_solver
from .multiple_shooting import make_ms_solver
from .nlp import NLPOptions, NLPResult, make_nlpsol
