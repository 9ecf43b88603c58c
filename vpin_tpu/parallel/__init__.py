from .mesh import (
    default_mesh, get_mesh, mesh_axis_size, set_mesh, use_mesh,
)
from .ops import (
    sharded_bound_top, sharded_msm_digits, sharded_regular_reduce,
    sharded_round_evals,
)

__all__ = [
    "default_mesh", "get_mesh", "mesh_axis_size", "set_mesh", "use_mesh",
    "sharded_bound_top", "sharded_msm_digits", "sharded_regular_reduce",
    "sharded_round_evals",
]
