from umeregrobust_tpu.data.synthetic import SceneConfig, make_pair, make_scene
