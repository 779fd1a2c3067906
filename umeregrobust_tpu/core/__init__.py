from umeregrobust_tpu.core.transforms import (
    apply_transform,
    compose,
    invert_rigid,
    make_transform,
    random_rigid_transform,
    random_rotation,
    relative_rotation_error,
    relative_translation_error,
    rotation_z,
)
from umeregrobust_tpu.core.ume import (
    estimate_rigid_from_ume,
    moment_matrix,
    subspace_projection,
    ume_distance,
    ume_pairwise_distance,
    ume_validity_mask,
)
