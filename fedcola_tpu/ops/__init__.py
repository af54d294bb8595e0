from fedcola_tpu.ops.attention import multi_head_attention  # noqa: F401
from fedcola_tpu.ops import losses  # noqa: F401
