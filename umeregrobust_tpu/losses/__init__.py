from umeregrobust_tpu.losses.losses import (
    CUBE_CORNERS,
    cube_registration_loss,
    pointwise_infonce,
    ume_contrastive_loss,
)
