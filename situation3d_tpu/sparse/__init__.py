from situation3d_tpu.sparse.tensor import SparseVoxels  # noqa: F401
from situation3d_tpu.sparse.kernel_map import (  # noqa: F401
    build_kernel_map,
    downsample_coords,
    kernel_offsets,
)
