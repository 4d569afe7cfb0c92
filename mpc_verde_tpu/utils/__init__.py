from .tree import tree_where
from .timing import Timer, timed
from .platform import force_cpu, force_tpu
