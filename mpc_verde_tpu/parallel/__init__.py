from .mesh import batch_mesh, distributed_init
from .batch import make_sharded_solver, BatchStats
