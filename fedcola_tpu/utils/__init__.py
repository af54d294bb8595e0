from fedcola_tpu.utils.metrics import MetricManager  # noqa: F401
from fedcola_tpu.utils.seeding import set_seed  # noqa: F401
from fedcola_tpu.utils.logging import set_logger  # noqa: F401
