from situation3d_tpu.ops.pointnet2 import (  # noqa: F401
    ball_query,
    furthest_point_sample,
    gather_points,
    group_points,
    three_interpolate,
    three_nn,
)
from situation3d_tpu.ops.voxelize import (  # noqa: F401
    sparse_quantize_np,
    voxelize_jax,
    voxelize_np,
)
