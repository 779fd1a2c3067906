from umeregrobust_tpu.utils.config import (
    apply_overrides,
    load_yaml_config,
    update_namespace_from_yaml,
)
from umeregrobust_tpu.utils.profiling import device_trace, phase, report, reset
