"""SEM preprocessing driver: build the per-pair cache.

Equivalent of reference datasets/sem_preprocessing.py:8-85: iterate a
dataset in preprocess mode (with SEM sampling equalization), pickle each
pair to {output}/{split}/{seq}/{frame0}_{frame1}.pickle with the same dict
schema, skip files that already exist (resumable), and accept an index
range for manual sharding across hosts.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

from umeregrobust_tpu.data.datasets import (
    NuscenesDataset,
    SemanticKITTIDataset,
    save_pair_pickle,
)

__all__ = ["run_sem_preprocessing"]


def run_sem_preprocessing(
    dataset_mode: str,
    split: str,
    data_path: str,
    output_path: str,
    range_idxs: Optional[Tuple[int, int]] = None,
    use_pc_completion: bool = True,
    verbose: bool = True,
) -> int:
    """Returns the number of pairs written (skips existing files)."""
    cls = SemanticKITTIDataset if dataset_mode == "kitti" else NuscenesDataset
    dset = cls(
        data_path=data_path,
        split=split,
        cache_data_path="",
        use_pc_completion=use_pc_completion,
        convert_points_to_grid=True,
        skip_invalid_entries=False,
    )
    lo, hi = range_idxs if range_idxs is not None else (0, len(dset))
    hi = min(hi, len(dset))
    written = 0
    for itr in range(lo, hi):
        seq_id, f0, f1 = dset._pair_key(itr)
        seq_str = f"{int(seq_id):02d}" if dataset_mode == "kitti" else str(seq_id)
        out_file = os.path.join(output_path, split, seq_str, f"{f0:06d}_{f1:06d}.pickle")
        if os.path.exists(out_file):
            continue
        (src_pts, src_seg, src_coords, tgt_pts, tgt_seg, tgt_coords,
         src_pts_tform, gt_tform, matches) = dset.preprocess_getitem(itr)
        save_pair_pickle(out_file, {
            "src_pts": src_pts, "src_seg": src_seg, "src_coords": src_coords,
            "tgt_pts": tgt_pts, "tgt_seg": tgt_seg, "tgt_coords": tgt_coords,
            "src_pts_tform": src_pts_tform, "gt_tform": gt_tform,
            "matches": matches,
        })
        written += 1
        if verbose and written % 50 == 0:
            print(f"[sem] {split} {itr - lo + 1}/{hi - lo} written={written}",
                  flush=True)
    return written
