"""Coloring-network training CLI.

Equivalent of reference train_coloring.py:252-439:

    python -m umeregrobust_tpu.cli.train_coloring --config kitti
    python -m umeregrobust_tpu.cli.train_coloring --config kitti --set num_epochs=2

Data parallel by default over all visible devices ('dp' mesh axis).
"""
from __future__ import annotations

import argparse
import os
import time
from typing import Iterator

import numpy as np

from umeregrobust_tpu.data.collate import collate_fixed
from umeregrobust_tpu.data.datasets import NuscenesDataset, SemanticKITTIDataset
from umeregrobust_tpu.train.trainer import TrainConfig, Trainer
from umeregrobust_tpu.utils.config import apply_overrides, update_namespace_from_yaml

_CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs", "train")


def _batches(dset, batch_size, max_pc_size, num_matches, shuffle, rng) -> Iterator:
    order = np.arange(len(dset))
    if shuffle:
        rng.shuffle(order)
    for i in range(0, len(order) - batch_size + 1, batch_size):
        samples = [dset[int(j)] for j in order[i: i + batch_size]]
        samples = [s for s in samples if len(s[8]) > 0]  # zero-match skip
        if not samples:
            continue
        yield collate_fixed(samples, max_pc_size=max_pc_size,
                            num_matches=num_matches, rng=rng)


def main(argv=None):
    from umeregrobust_tpu.utils.cache import ensure_compile_cache
    ensure_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", choices=["kitti", "nuscenes"], default="kitti")
    parser.add_argument("--set", action="append", default=[])
    args = parser.parse_args(argv)
    cfg_path = os.path.join(_CFG_DIR, f"train_{args.config}_config.yaml")
    args = update_namespace_from_yaml(args, cfg_path)
    args = apply_overrides(args, args.set)
    rng = np.random.default_rng(int(args.random_seed))

    cfg = TrainConfig(
        lr=float(args.lr),
        batch_size=int(args.batch_size),
        max_pc_size=int(getattr(args, "pc_capacity", 16384)),
        num_pw_samples=int(args.num_pw_samples),
        ume_n_samples=int(args.ume_n_samples),
        ume_max_nn=int(args.ume_max_nn),
        ume_min_nn=int(args.ume_min_nn),
        ume_r_nn=float(args.ume_r_nn),
        tau=float(args.tau),
        tau_ume=float(args.tau_ume),
        tau_ume_neg=float(args.tau_ume_neg),
        use_ume_loss=bool(args.use_ume_loss),
        use_reg_loss=bool(args.use_reg_loss),
        pw_loss_weight=float(args.pw_loss_weight),
        ume_loss_weight=float(args.ume_loss_weight),
        reg_loss_weight=float(args.reg_loss_weight),
        reg_loss_cube_r=float(args.reg_loss_cube_r),
        reg_loss_intersection_thr=float(args.reg_loss_intersection_thr),
        out_channels=int(args.out_channels),
    )

    cls = SemanticKITTIDataset if args.dataset == "kitti" else NuscenesDataset
    dset_train = cls(data_path=args.data_path, split="train",
                     cache_data_path=args.cache_data_path,
                     dataset_size=int(args.train_size),
                     use_augmentations=bool(args.use_aug),
                     skip_invalid_entries=bool(args.skip_invalid_entries))
    dset_valid = cls(data_path=args.data_path, split="val",
                     cache_data_path=args.cache_data_path,
                     dataset_size=int(args.val_size))

    run_name = f"{args.run_name}_{args.dataset}_{time.strftime('%d%m%y_%H%M%S')}"
    out_dir = os.path.join(args.output_path, run_name)
    trainer = Trainer(cfg, out_dir, seed=int(args.random_seed))
    if getattr(args, "resume_train_path", ""):
        from umeregrobust_tpu.train.checkpoint import load_checkpoint
        blob = load_checkpoint(args.resume_train_path)
        trainer.params = blob["params"]
        trainer.bn_state = blob["bn_state"]
        trainer.opt_state = blob["opt_state"]
        trainer.epoch = blob["epoch"]
        print(f"resumed from {args.resume_train_path} at epoch {trainer.epoch}")

    from umeregrobust_tpu.utils.prefetch import prefetch

    for epoch in range(trainer.epoch, int(args.num_epochs)):
        # host-side collate runs on a prefetch thread so batch prep
        # overlaps the device step (reference: DataLoader(num_workers=8),
        # train_coloring.py:351-356)
        trainer.run_epoch(
            prefetch(_batches(dset_train, cfg.batch_size, cfg.max_pc_size,
                              cfg.num_pw_samples, True, rng)), train=True)
        valid = trainer.run_epoch(
            prefetch(_batches(dset_valid, cfg.batch_size, cfg.max_pc_size,
                              cfg.num_pw_samples, False, rng)), train=False)
        trainer.end_epoch(valid)
        print(f"epoch {epoch} valid: " + " ".join(
            f"{k}={v:.4f}" for k, v in valid.items()), flush=True)


if __name__ == "__main__":
    main()
