from umeregrobust_tpu.models.resunet import (
    ARCHS,
    ArchSpec,
    build_unet_geometry,
    default_level_capacities,
    init_resunet,
    resunet_apply,
)
from umeregrobust_tpu.models.convert import (
    convert_state_dict,
    load_torch_checkpoint,
    offset_permutation,
)
