from umeregrobust_tpu.pipeline.ume_gen import ume_from_ball_query
from umeregrobust_tpu.pipeline.matching import (
    argmin_match,
    hungarian_match,
    probabilistic_match_filter,
)
from umeregrobust_tpu.pipeline.correlator import (
    cauchy_kernel,
    correlator_scores,
    correlator_scores_radius,
    feature_spatial_var,
    prepare_weighted_features,
    select_best_transform,
)
from umeregrobust_tpu.pipeline.icp import icp_point_to_point, umeyama
from umeregrobust_tpu.pipeline.registration import (
    RegistrationConfig,
    copy_features_to_raw,
    register_pair_features,
)
from umeregrobust_tpu.pipeline.eval_metrics import calc_inlier_ratio
from umeregrobust_tpu.pipeline.rtume import rtume_estimate
from umeregrobust_tpu.pipeline.keypoint_samplers import (
    sample_grid_keypoints,
    sample_smart_keypoints,
)
from umeregrobust_tpu.pipeline.e2e import register_pair_e2e, register_pairs_batched
