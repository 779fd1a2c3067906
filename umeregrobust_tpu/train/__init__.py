from umeregrobust_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from umeregrobust_tpu.train.trainer import TrainConfig, Trainer, make_train_step
