from tvc.utils.checkpoint import CheckpointManager  # noqa: F401
from tvc.utils.hardware import (  # noqa: F401
    DeviceInfo,
    DeviceMonitor,
    HardwareDetector,
    SystemInfo,
    detect_and_configure,
    device_memory_stats,
    optimize_batch_size,
)
from tvc.utils.logger import ExperimentInfo, ExperimentLogger  # noqa: F401
from tvc.utils.profiles import (  # noqa: F401
    PROFILES,
    DynamicConfigManager,
    DynamicConfigProfile,
    select_profile,
)
from tvc.utils.seed import SeedContext, derive_key, set_random_seed  # noqa: F401
