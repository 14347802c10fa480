"""Training smoke tests (analog of reference tests/test_tcn_training.py:
model zoo × one training step, plus checkpoint round-trip)."""

import numpy as np
import pytest

import jax

from gnn_tracking_tpu.graphs import EventGraph
from gnn_tracking_tpu.losses.ec import EdgeWeightBCELoss, EdgeWeightFocalLoss
from gnn_tracking_tpu.losses.metric_learning import GraphConstructionHingeEmbeddingLoss
from gnn_tracking_tpu.losses.oc import CondensationLossRG, CondensationLossTiger
from gnn_tracking_tpu.models.edge_classifier import ECForGraphTCN
from gnn_tracking_tpu.models.graph_construction import GraphConstructionFCNN
from gnn_tracking_tpu.models.track_condensation_networks import (
    GraphTCN,
    GraphTCNForMLGCPipeline,
    PerfectECGraphTCN,
)
from gnn_tracking_tpu.postprocessing.dbscanscanner import DBSCANHyperParamScanner
from gnn_tracking_tpu.training.module import ECModule, MLModule, TCModule
from gnn_tracking_tpu.training.trainer import Trainer
from gnn_tracking_tpu.utils.loading import (
    PaddingConfig,
    TestTrackingDataModule,
    load_graph,
    save_graph,
)

N, E = 80, 240
NODE_DIM, EDGE_DIM = 14, 4


def make_graph(seed):
    rng = np.random.default_rng(seed)
    pid = rng.integers(0, 12, size=N)
    ei = rng.integers(0, N, size=(2, E))
    same = (pid[ei[0]] == pid[ei[1]]) & (pid[ei[0]] > 0)
    iu = np.triu_indices(N, k=1)
    keep = (pid[iu[0]] == pid[iu[1]]) & (pid[iu[0]] != 0)
    te = np.stack([iu[0][keep], iu[1][keep]])
    return EventGraph.from_arrays(
        x=rng.normal(size=(N, NODE_DIM)),
        edge_index=ei,
        edge_attr=rng.normal(size=(E, EDGE_DIM)),
        y=same,
        particle_id=pid,
        pt=(2 * rng.random(12))[pid],
        eta=(8 * (rng.random(12) - 0.5))[pid],
        reconstructable=np.ones(N),
        layer=rng.integers(0, 30, size=N),
        true_edge_index=te,
    )


@pytest.fixture(scope="module")
def datamodule():
    padding = PaddingConfig(node_bucket=128, edge_bucket=512, true_edge_bucket=512)
    return TestTrackingDataModule([make_graph(0), make_graph(1)], padding=padding)


def _losses_decrease(history, key="total_train"):
    vals = [h[key] for h in history if key in h]
    return len(vals) < 2 or vals[-1] <= vals[0] * 1.5  # loose: just not exploding


@pytest.mark.parametrize("loss_cls", [CondensationLossTiger, CondensationLossRG])
def test_tc_training(datamodule, loss_cls):
    module = TCModule(
        model=GraphTCN(h_dim=4, e_dim=4, h_outdim=2, hidden_dim=12, L_ec=2, L_hc=2),
        loss_fct=loss_cls(lw_noise=1.0, lw_coward=1.0, max_n_objects=32),
        lr=1e-3,
    )
    trainer = Trainer(max_epochs=2, log_dir="/tmp/gnntest", print_validation_results=False)
    metrics = trainer.fit(module, datamodule)
    assert "attractive" in metrics
    assert np.isfinite(metrics["total"])
    assert _losses_decrease(trainer.metrics_history)


def test_tc_training_with_cluster_scanner(datamodule):
    module = TCModule(
        model=PerfectECGraphTCN(h_dim=4, e_dim=4, h_outdim=2, hidden_dim=12, L_hc=2),
        loss_fct=CondensationLossTiger(max_n_objects=32),
        cluster_scanner=DBSCANHyperParamScanner(n_trials=2, keep_best=1, seed=0),
    )
    trainer = Trainer(max_epochs=1, log_dir="/tmp/gnntest", print_validation_results=False)
    metrics = trainer.fit(module, datamodule)
    assert "trk.double_majority_pt0.9" in metrics


@pytest.mark.parametrize("loss_cls", [EdgeWeightBCELoss, EdgeWeightFocalLoss])
def test_ec_training(datamodule, loss_cls):
    module = ECModule(
        model=ECForGraphTCN(interaction_node_dim=4, interaction_edge_dim=4, L_ec=2, hidden_dim=12),
        loss_fct=loss_cls(),
    )
    trainer = Trainer(max_epochs=1, log_dir="/tmp/gnntest", print_validation_results=False)
    metrics = trainer.fit(module, datamodule)
    assert "roc_auc" in metrics
    assert 0 <= metrics["roc_auc"] <= 1
    assert "max_mcc_pt0.9" in metrics


def test_ml_training(datamodule):
    module = MLModule(
        model=GraphConstructionFCNN(in_dim=NODE_DIM, hidden_dim=16, out_dim=8, depth=2),
        loss_fct=GraphConstructionHingeEmbeddingLoss(max_num_neighbors=32),
    )
    trainer = Trainer(max_epochs=1, log_dir="/tmp/gnntest", print_validation_results=False)
    metrics = trainer.fit(module, datamodule)
    assert "attractive" in metrics
    assert "repulsive" in metrics


def test_checkpoint_roundtrip(datamodule, tmp_path):
    module = TCModule(
        model=GraphTCNForMLGCPipeline(h_dim=4, e_dim=4, h_outdim=2, hidden_dim=12, L_hc=2),
        loss_fct=CondensationLossTiger(max_n_objects=32),
    )
    trainer = Trainer(max_epochs=1, log_dir=tmp_path, print_validation_results=False)
    trainer.fit(module, datamodule, config={"model": "GraphTCNForMLGCPipeline"})
    ckpts = list((trainer.log_dir / "checkpoints").glob("checkpoint_*"))
    assert ckpts

    module2 = TCModule(
        model=GraphTCNForMLGCPipeline(h_dim=4, e_dim=4, h_outdim=2, hidden_dim=12, L_hc=2),
        loss_fct=CondensationLossTiger(max_n_objects=32),
    )
    # init params then restore
    g = next(iter(datamodule.val_dataloader()))
    module2.setup_params(g)
    ckpt_dirs = [c for c in ckpts if c.is_dir()]
    trainer.checkpointer.restore(module2, ckpt_dirs[0])
    out1 = module.forward(g)
    out2 = module2.forward(g)
    np.testing.assert_allclose(np.asarray(out1["H"]), np.asarray(out2["H"]), rtol=1e-6)


def test_graph_save_load_roundtrip(tmp_path):
    g = make_graph(3)
    save_graph(g, tmp_path / "g.npz")
    g2 = load_graph(tmp_path / "g.npz")
    np.testing.assert_allclose(np.asarray(g.x), np.asarray(g2.x))
    np.testing.assert_array_equal(np.asarray(g.edge_index), np.asarray(g2.edge_index))
    np.testing.assert_array_equal(np.asarray(g.particle_id), np.asarray(g2.particle_id))


def test_frozen_prefixes(datamodule):
    module = ECModule(
        model=ECForGraphTCN(interaction_node_dim=4, interaction_edge_dim=4, L_ec=2, hidden_dim=12),
        loss_fct=EdgeWeightBCELoss(),
        frozen_prefixes=("model/ec_node_encoder",),
    )
    g = next(iter(datamodule.train_dataloader()))
    module.setup_params(g)
    import flax

    before = flax.traverse_util.flatten_dict(jax.tree.map(np.asarray, module.params))
    module.training_step(g)
    after = flax.traverse_util.flatten_dict(jax.tree.map(np.asarray, module.params))
    frozen_same = [
        np.array_equal(before[k], after[k]) for k in before if k[0].startswith("model") and "ec_node_encoder" in str(k)
    ]
    trainable_changed = [
        not np.array_equal(before[k], after[k]) for k in before if "W" in str(k)
    ]
    assert frozen_same and all(frozen_same)
    assert any(trainable_changed)


def test_bf16_training(datamodule):
    module = TCModule(
        model=GraphTCN(h_dim=4, e_dim=4, h_outdim=2, hidden_dim=12, L_ec=2, L_hc=2),
        loss_fct=CondensationLossTiger(max_n_objects=32),
        precision="bf16",
    )
    trainer = Trainer(max_epochs=1, log_dir="/tmp/gnntest", print_validation_results=False)
    metrics = trainer.fit(module, datamodule)
    assert np.isfinite(metrics["total"])
    # params stay fp32
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(module.params)[0]
    assert leaf.dtype in (jnp.float32, jnp.float64)


def test_best_checkpoint_monitor(datamodule, tmp_path):
    module = ECModule(
        model=ECForGraphTCN(interaction_node_dim=4, interaction_edge_dim=4, L_ec=2, hidden_dim=12),
        loss_fct=EdgeWeightBCELoss(),
    )
    trainer = Trainer(
        max_epochs=2,
        log_dir=tmp_path,
        print_validation_results=False,
        monitor="roc_auc",
    )
    trainer.fit(module, datamodule)
    best = list((trainer.log_dir / "checkpoints").glob("checkpoint_best"))
    assert best
    assert trainer._best_monitor is not None


def test_haughty_focal_loss(datamodule):
    from gnn_tracking_tpu.losses.ec import HaughtyFocalLoss

    g = next(iter(datamodule.val_dataloader()))
    loss = HaughtyFocalLoss(pt_thld=0.5)(
        w=jax.numpy.full(g.num_edges, 0.5),
        y=g.y,
        edge_index=g.edge_index,
        pt=g.pt,
        edge_mask=g.edge_mask,
    )
    assert np.isfinite(float(loss))


def test_training_deterministic_with_seed(datamodule):
    def run():
        module = TCModule(
            model=GraphTCN(h_dim=4, e_dim=4, h_outdim=2, hidden_dim=12, L_ec=2, L_hc=2),
            loss_fct=CondensationLossTiger(max_n_objects=32),
            rng_seed=123,
        )
        losses = []
        for batch in datamodule.val_dataloader():  # deterministic order
            module.setup_params(batch)
            losses.append(module.training_step(batch)["total"])
        return losses

    assert run() == run()


def test_trainer_test_split(datamodule, tmp_path):
    module = ECModule(
        model=ECForGraphTCN(interaction_node_dim=4, interaction_edge_dim=4, L_ec=2, hidden_dim=12),
        loss_fct=EdgeWeightBCELoss(),
    )
    trainer = Trainer(max_epochs=1, log_dir=tmp_path, print_validation_results=False)
    trainer.fit(module, datamodule)
    metrics = trainer.test(module, datamodule)
    assert "total" in metrics


def test_batchnorm_state_through_training_and_checkpoint(datamodule, tmp_path):
    """BatchNorm running averages: updated by training steps, used in eval,
    and carried through checkpoint save/restore."""
    import flax.linen as nn
    import jax.numpy as jnp

    from gnn_tracking_tpu.models.mlp import MLP
    from gnn_tracking_tpu.models.resin import MaskedBatchNorm

    class BNModel(nn.Module):
        @nn.compact
        def __call__(self, data):
            h = MaskedBatchNorm()(data.x, data.node_mask)
            w = nn.sigmoid(
                MLP(output_size=1, hidden_dim=8, L=2)(
                    jnp.concatenate([h[data.edge_index[0]], h[data.edge_index[1]]], 1)
                )
            ).squeeze(-1)
            return {"W": jnp.clip(w, 1e-6, 1 - 1e-6)}

    def make(**kw):
        return ECModule(model=BNModel(), loss_fct=EdgeWeightBCELoss(), **kw)

    module = make()
    datamodule.setup("fit")
    batch = next(iter(datamodule.train_dataloader()))
    module.setup_params(batch)
    assert module.batch_stats, "BN model must expose batch_stats"
    mean0 = np.asarray(
        jax.tree_util.tree_leaves(module.batch_stats)[0]
    ).copy()
    module.training_step(batch)
    module.training_step(batch)
    mean1 = np.asarray(jax.tree_util.tree_leaves(module.batch_stats)[0])
    assert not np.allclose(mean0, mean1), "running stats must update in training"
    # eval uses the stored running averages (no mutation)
    before = jax.tree_util.tree_map(np.asarray, module.batch_stats)
    module.validation_step(batch, 0)
    after = jax.tree_util.tree_map(np.asarray, module.batch_stats)
    for a, b in zip(jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(a, b)

    from gnn_tracking_tpu.training.trainer import Checkpointer

    ckptr = Checkpointer(tmp_path)
    path = ckptr.save(module, tag="bn")
    module2 = make()
    module2.setup_params(batch)
    ckptr.restore(module2, path)
    for a, b in zip(
        jax.tree_util.tree_leaves(module.batch_stats),
        jax.tree_util.tree_leaves(module2.batch_stats),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_checkpointing_roundtrip(datamodule, tmp_path):
    """Background (async) orbax saves commit correctly and restore exactly."""
    module = ECModule(
        model=ECForGraphTCN(
            interaction_node_dim=4, interaction_edge_dim=4, L_ec=2, hidden_dim=12
        ),
        loss_fct=EdgeWeightBCELoss(),
    )
    trainer = Trainer(
        max_epochs=2, log_dir=tmp_path, print_validation_results=False,
        async_checkpoints=True,
    )
    trainer.fit(module, datamodule)
    ckpts = sorted(
        c
        for c in (trainer.log_dir / "checkpoints").glob("checkpoint_*")
        if c.is_dir()
    )
    assert len(ckpts) == 2
    module2 = ECModule(
        model=ECForGraphTCN(
            interaction_node_dim=4, interaction_edge_dim=4, L_ec=2, hidden_dim=12
        ),
        loss_fct=EdgeWeightBCELoss(),
    )
    datamodule.setup("fit")
    batch = next(iter(datamodule.train_dataloader()))
    module2.setup_params(batch)
    trainer.checkpointer.restore(module2, ckpts[-1])
    for a, b in zip(
        jax.tree_util.tree_leaves(module.params),
        jax.tree_util.tree_leaves(module2.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_resume_from_checkpoint(datamodule, tmp_path):
    """Preemption drill: a new Trainer+module resumes from the latest
    checkpoint in the same log dir and continues the step count."""
    def make():
        return ECModule(
            model=ECForGraphTCN(
                interaction_node_dim=4, interaction_edge_dim=4, L_ec=2,
                hidden_dim=12,
            ),
            loss_fct=EdgeWeightBCELoss(),
        )

    m1 = make()
    t1 = Trainer(
        max_epochs=2, log_dir=tmp_path, name="drill",
        print_validation_results=False,
    )
    t1.fit(m1, datamodule)
    steps_before = m1.step
    assert steps_before > 0

    # "preempted" — fresh process state, same log dir
    m2 = make()
    t2 = Trainer(
        max_epochs=1, log_dir=tmp_path, name="drill",
        print_validation_results=False,
    )
    t2.fit(m2, datamodule, resume=True)
    assert m2.step > steps_before  # continued, not restarted
    for a, b in zip(
        jax.tree_util.tree_leaves(m1.params),
        jax.tree_util.tree_leaves(m2.params),
    ):
        assert np.asarray(a).shape == np.asarray(b).shape


def test_ema_selection(datamodule, tmp_path):
    """ema_decay: the EMA tree is maintained over steps, differs from the
    raw params, is what validation/monitor/checkpoint_best see, and
    validate(params=...) restores raw params afterwards (round-5 leak-free
    protocol machinery)."""
    module = ECModule(
        model=ECForGraphTCN(
            interaction_node_dim=4, interaction_edge_dim=4, L_ec=2,
            hidden_dim=12,
        ),
        loss_fct=EdgeWeightFocalLoss(),
    )
    trainer = Trainer(
        max_epochs=3, log_dir=tmp_path, print_validation_results=False,
        monitor="roc_auc", ema_decay=0.9,
    )
    trainer.fit(module, datamodule)
    assert trainer.ema_params is not None
    # EMA differs from the raw last-step params (decay < 1, >1 step)
    diffs = jax.tree.leaves(
        jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            trainer.ema_params,
            module.params,
        )
    )
    assert max(diffs) > 0

    # checkpoint_best holds the EMA weights, not the raw ones
    best = tmp_path / trainer.name / "checkpoints" / "checkpoint_best"
    assert best.exists()
    raw_before = jax.tree.map(lambda a: np.asarray(a).copy(), module.params)
    trainer.checkpointer.restore(module, best)
    ema_vs_best = jax.tree.leaves(
        jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            trainer.ema_params,
            module.params,
        )
    )
    # best checkpoint was saved from SOME epoch's EMA tree; it must be
    # closer to the final EMA than the raw params are (sanity, not equality:
    # the best epoch may precede the last)
    raw_vs_best = jax.tree.leaves(
        jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            raw_before,
            module.params,
        )
    )
    assert max(ema_vs_best) <= max(raw_vs_best) + 1e-6

    # params override in validate(): module params restored afterwards
    module.params = raw_before
    loader = datamodule.val_dataloader()
    trainer.validate(module, loader=loader, params=trainer.ema_params)
    after = jax.tree.leaves(
        jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            module.params,
            raw_before,
        )
    )
    assert max(after) == 0


def test_resume_skips_checkpoint_best(tmp_path):
    """find_latest_checkpoint must never resume from checkpoint_best: with
    EMA it pairs EMA weights with the raw trajectory's optimizer state
    (a selection artifact, not a training state)."""
    import time as _time

    from gnn_tracking_tpu.training.config import find_latest_checkpoint

    ck = tmp_path / "trial" / "checkpoints"
    ck.mkdir(parents=True)
    (ck / "checkpoint_00000005").mkdir()
    _time.sleep(0.01)
    (ck / "checkpoint_best").mkdir()  # newer mtime than the step save
    latest = find_latest_checkpoint(tmp_path)
    assert latest.name == "checkpoint_00000005"
    # only checkpoint_best present -> no resumable checkpoint
    import shutil

    shutil.rmtree(ck / "checkpoint_00000005")
    with pytest.raises(FileNotFoundError):
        find_latest_checkpoint(tmp_path)
