from .system import System
from .neighbors import Neighbors, neighbor_list, coord_diffs
