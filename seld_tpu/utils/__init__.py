from seld_tpu.utils.logging import setup_logging, get_logger  # noqa: F401
from seld_tpu.utils.platform import describe_devices  # noqa: F401
