from umeregrobust_tpu.data.synthetic import SceneConfig, make_pair, make_scene
from umeregrobust_tpu.data.collate import collate_fixed
from umeregrobust_tpu.data.datasets import (
    NuscenesDataset,
    SemanticKITTIDataset,
    load_pair_pickle,
    save_pair_pickle,
)
from umeregrobust_tpu.data.laserscan import (
    SEMANTIC_KITTI_LEARNING_MAP,
    apply_learning_map,
    load_semantic_kitti_pair_frame,
    read_kitti_label,
    read_kitti_scan,
)
from umeregrobust_tpu.data.matching_host import mutual_matches, one_side_matches
from umeregrobust_tpu.data.registry import PairRegistry, load_registry
from umeregrobust_tpu.data.sem import SEMConfig, equalize_sampling
from umeregrobust_tpu.data.sem_preprocess import run_sem_preprocessing
