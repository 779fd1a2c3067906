"""Training-step tests: gradients flow, loss decreases on a fixed batch,
BN state updates, checkpoint round-trip, and the data-parallel sharded step
runs on the virtual 8-device mesh."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umeregrobust_tpu.data.synthetic import SceneConfig, make_collated_batch
from umeregrobust_tpu.parallel import make_mesh, replicate, shard_batch
from umeregrobust_tpu.train import TrainConfig, Trainer, load_checkpoint

pytestmark = pytest.mark.slow  # heavy tier; fast gate runs -m 'not slow'


TINY = TrainConfig(
    max_pc_size=1024,
    num_pw_samples=64,
    ume_n_samples=16,
    ume_max_nn=64,
    ume_min_nn=8,
    ume_r_nn=4.0,
    compute_dtype="float32",
    level_capacity_ratios=(1.0, 1.0, 0.8, 0.5, 0.25),
)

SCENE = SceneConfig(extent=10.0, ground_points=1500, structure_points=2500,
                    n_boxes=6, n_walls=2, n_poles=3, dropout=0.2)


@pytest.fixture(scope="module")
def batch2():
    return make_collated_batch(SCENE, n_pairs=2, max_pc_size=1024,
                               num_matches=64, seed=4)


class TestTrainStep:
    def test_loss_decreases_and_state_updates(self, tmp_path, batch2):
        tr = Trainer(TINY, str(tmp_path))
        b = {k: jnp.asarray(v) for k, v in batch2.items()}
        p0 = tr.params
        s0 = tr.bn_state
        losses = []
        for _ in range(5):
            tr.params, tr.bn_state, tr.opt_state, m = tr.train_step(
                tr.params, tr.bn_state, tr.opt_state, b)
            losses.append(float(m["total_loss"]))
        # params must have moved
        moved = jax.tree_util.tree_map(
            lambda a, b_: float(jnp.abs(a - b_).max()), p0, tr.params)
        assert max(jax.tree_util.tree_leaves(moved)) > 0
        # bn means must have moved
        d = float(jnp.abs(tr.bn_state["norm1"]["mean"] - s0["norm1"]["mean"]).max())
        assert d > 0
        # loss trend down on the same batch
        assert losses[-1] < losses[0], losses
        assert np.isfinite(losses).all()

    def test_eval_step_runs(self, tmp_path, batch2):
        tr = Trainer(TINY, str(tmp_path))
        b = {k: jnp.asarray(v) for k, v in batch2.items()}
        m = tr.eval_step(tr.params, tr.bn_state, b)
        assert np.isfinite(float(m["total_loss"]))

    def test_valid_epoch_metrics_and_best_checkpoints(self, tmp_path, batch2):
        """Validation epochs compute inlier_ratio + CHR and end_epoch keeps
        six best-metric checkpoints (reference train_coloring.py:96-207,
        404-437)."""
        tr = Trainer(TINY, str(tmp_path))
        m = tr.run_epoch([batch2], train=False)
        assert "inlier_ratio" in m and 0.0 <= m["inlier_ratio"] <= 1.0
        assert "chr" in m and 0.0 <= m["chr"] <= 1.0
        assert len(Trainer.BEST_KEYS) == 6
        tr.end_epoch(m)
        import glob
        best = glob.glob(os.path.join(str(tmp_path), "best_*_checkpoint.pkl"))
        # every metric present in m that has a BEST_KEY gets a checkpoint
        expect = [k for k, _ in Trainer.BEST_KEYS if k in m]
        assert len(best) == len(expect), (best, expect)

    def test_nonfinite_grad_batch_skips_update(self, tmp_path, batch2):
        """A batch that produces non-finite grads must leave params,
        optimizer state and BN stats untouched (one degenerate batch must
        not poison the run) and flag metrics['nonfinite_grad']."""
        tr = Trainer(TINY, str(tmp_path))
        b = {k: jnp.asarray(v) for k, v in batch2.items()}
        # poison one weight: the forward goes non-finite, so grads do too
        # (masked fixed-shape math absorbs non-finite *data*, so data is
        # not a reliable trigger — a degenerate real batch enters through
        # the loss surface instead, which this guard also covers)
        leaves, treedef = jax.tree_util.tree_flatten(tr.params)
        leaves[0] = jnp.full_like(leaves[0], jnp.inf)
        tr.params = jax.tree_util.tree_unflatten(treedef, leaves)
        p0 = jax.tree_util.tree_map(lambda x: np.asarray(x), tr.params)
        p1, bn1, opt1, m = tr.train_step(tr.params, tr.bn_state,
                                         tr.opt_state, b)
        assert float(m["nonfinite_grad"]) == 1.0
        for a, b in zip(jax.tree_util.tree_leaves(p0),
                        jax.tree_util.tree_leaves(p1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_checkpoint_roundtrip(self, tmp_path, batch2):
        tr = Trainer(TINY, str(tmp_path))
        tr.end_epoch({"total_loss": 1.0, "pointwise_loss": 0.5,
                      "ume_loss": 0.3, "reg_loss": 2.0})
        path = os.path.join(str(tmp_path), "last_epoch_checkpoint.pkl")
        blob = load_checkpoint(path)
        assert blob["epoch"] == 1
        for (k1, a), (k2, b_) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(tr.params), key=str),
            sorted(jax.tree_util.tree_leaves_with_path(blob["params"]), key=str),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_))


class TestDataParallel:
    def test_sharded_step_on_8_devices(self, tmp_path):
        assert jax.device_count() == 8
        batch = make_collated_batch(SCENE, n_pairs=8, max_pc_size=1024,
                                    num_matches=64, seed=6)
        mesh = make_mesh()
        tr = Trainer(TINY, str(tmp_path))
        params = replicate(mesh, tr.params)
        bn = replicate(mesh, tr.bn_state)
        opt = replicate(mesh, tr.opt_state)
        b = shard_batch(mesh, {k: jnp.asarray(v) for k, v in batch.items()})
        params, bn, opt, m = tr.train_step(params, bn, opt, b)
        assert np.isfinite(float(m["total_loss"]))
        # result params stay replicated-consistent with a single-device run
        p1, _, _, m1 = tr.train_step(tr.params, tr.bn_state, tr.opt_state,
                                     {k: jnp.asarray(v) for k, v in batch.items()})
        np.testing.assert_allclose(float(m["total_loss"]),
                                   float(m1["total_loss"]), rtol=1e-4)
