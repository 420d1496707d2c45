from situation3d_tpu.ckpt_compat.common import (  # noqa: F401
    linear_kernel,
    load_torch_state_dict,
)
from situation3d_tpu.ckpt_compat.minkunet import convert_minkunet  # noqa: F401
from situation3d_tpu.ckpt_compat.mpnet import convert_mpnet  # noqa: F401
from situation3d_tpu.ckpt_compat.t5 import convert_t5  # noqa: F401
from situation3d_tpu.ckpt_compat.blip2 import convert_blip2  # noqa: F401
