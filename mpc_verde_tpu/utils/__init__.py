from .tree import tree_where
from .timing import Timer, timed
