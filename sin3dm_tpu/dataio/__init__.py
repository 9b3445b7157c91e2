from . import grid
from .grid import normalize_aabb, sample_grid_points_aabb
