"""Pinned-value loss tests — the numerical acceptance suite.

The pinned float64 values are the reference's
(``/root/reference/tests/test_losses.py:112-203``); the mock-data generator
replays the identical ``np.random.default_rng`` draw sequence so our losses
must reproduce them verbatim.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from pytest import approx

from gnn_tracking_tpu.losses import LossClones
from gnn_tracking_tpu.losses.ec import (
    EdgeWeightBCELoss,
    binary_cross_entropy,
    binary_focal_loss,
)
from gnn_tracking_tpu.losses.metric_learning import (
    GraphConstructionHingeEmbeddingLoss,
)
from gnn_tracking_tpu.losses.oc import (
    CondensationLossRG,
    CondensationLossTiger,
    ObjectLoss,
)
from gnn_tracking_tpu.utils.dictionaries import to_floats


def numpy_truth_edge_index(pids: np.ndarray) -> np.ndarray:
    """All unordered intra-particle hit pairs (reference
    ``preprocessing/point_cloud_builder.py:20-37``)."""
    same = (pids[:, None] == pids[None, :]) & (pids[:, None] != 0)
    iu = np.triu_indices(len(pids), k=1)
    keep = same[iu]
    return np.stack([iu[0][keep], iu[1][keep]])


@dataclass
class MockData:
    beta: jax.Array
    x: jax.Array
    particle_id: jax.Array
    pred: jax.Array
    truth: jax.Array
    pt: jax.Array
    eta: jax.Array
    reconstructable: jax.Array
    batch: jax.Array
    true_edge_index: jax.Array


def generate_test_data(n_nodes=1000, n_particles=250, rng=None) -> MockData:
    if rng is None:
        rng = np.random.default_rng()
    pid = rng.choice(np.arange(n_particles), size=n_nodes)
    pid_unique = np.unique(pid)
    pt_pid = 2 * rng.random(len(pid_unique))
    pt = pt_pid[pid]
    eta_pid = 8 * (rng.random(len(pid_unique)) - 0.5)
    eta = eta_pid[pid]
    reco_pid = rng.choice([0.0, 1.0], size=len(pid_unique))
    reco = reco_pid[pid]
    return MockData(
        beta=jnp.asarray(rng.random(n_nodes)),
        x=jnp.asarray(rng.random((n_nodes, 3))),
        particle_id=jnp.asarray(pid),
        pred=jnp.asarray(rng.choice([0.0, 1.0], size=(n_nodes, 1))),
        truth=jnp.asarray(rng.choice([0.0, 1.0], size=(n_nodes, 1))),
        pt=jnp.asarray(pt),
        eta=jnp.asarray(eta),
        reconstructable=jnp.asarray(reco),
        batch=jnp.zeros(n_nodes, dtype=jnp.int32),
        true_edge_index=jnp.asarray(numpy_truth_edge_index(pid)),
    )


td1 = generate_test_data(50, n_particles=3, rng=np.random.default_rng(seed=0))
td2 = generate_test_data(100, n_particles=10, rng=np.random.default_rng(seed=0))


def get_condensation_loss(td: MockData, *, strategy="tiger", **kwargs) -> dict:
    cls = {"tiger": CondensationLossTiger, "rg": CondensationLossRG}[strategy]
    loss_fct = cls(max_n_objects=16, **kwargs)
    return to_floats(
        loss_fct(
            beta=td.beta,
            x=td.x,
            particle_id=td.particle_id,
            reconstructable=td.reconstructable,
            pt=td.pt,
            eta=td.eta,
        ).loss_dct
    )


def get_object_loss(td: MockData, **kwargs) -> float:
    return float(
        ObjectLoss(max_n_objects=16, **kwargs).object_loss(
            beta=td.beta, particle_id=td.particle_id, pred=td.pred, truth=td.truth
        )
    )


_td1_c_losses = {
    "attractive": 0.48778231210119105,
    "repulsive": 35939197600.633316,
    "coward": 0.051056325062234675,
    "noise": 0.5346992111891886,
}
_td2_c_losses = {
    "attractive": 1.5953161268602611,
    "repulsive": 3.478838882898964,
    "coward": 0.03316374922649601,
    "noise": 0.564675177839844,
}


def test_pin_condensation_losses_tiger():
    assert get_condensation_loss(td1) == approx(_td1_c_losses)
    assert get_condensation_loss(td2) == approx(_td2_c_losses)


def test_pin_condensation_losses_rg():
    assert get_condensation_loss(td1, strategy="rg") == approx(_td1_c_losses)
    assert get_condensation_loss(td2, strategy="rg") == approx(_td2_c_losses)


def test_pin_object_loss_efficiency():
    assert get_object_loss(td1) == approx(0.4858411097284774)
    assert get_object_loss(td2) == approx(0.5769124284752167)


def test_pin_object_loss_purity():
    assert get_object_loss(td1, mode="purity") == approx(0.010453588032279765)
    assert get_object_loss(td2, mode="purity") == approx(0.00563383851854332)


def test_focal_loss_vs_bce():
    rng = np.random.default_rng(1)
    inpt = jnp.asarray(rng.random(10))
    target = jnp.asarray((rng.random(10) > 0.5).astype(float))
    assert float(
        binary_focal_loss(inpt=inpt, target=target, alpha=0.5, gamma=0.0)
    ) == approx(0.5 * float(binary_cross_entropy(inpt=inpt, target=target)))


def test_loss_clones():
    rng = np.random.default_rng(2)
    loss = EdgeWeightBCELoss()
    eclc = LossClones(loss)
    evaluated = eclc(
        w_0=jnp.asarray(rng.random(10)),
        w_suffix=jnp.asarray(rng.random(10)),
        y_0=jnp.asarray((rng.random(10) > 0.5).astype(float)),
        y_suffix=jnp.asarray((rng.random(10) > 0.5).astype(float)),
    )
    assert len(evaluated) == 2
    assert "0" in evaluated
    assert "suffix" in evaluated


def get_ml_loss(loss_fct, td: MockData) -> dict:
    return to_floats(
        loss_fct(
            x=td.x,
            particle_id=td.particle_id,
            reconstructable=td.reconstructable,
            pt=td.pt,
            eta=td.eta,
            batch=td.batch,
            true_edge_index=td.true_edge_index,
        ).loss_dct
    )


def test_hinge_loss():
    assert get_ml_loss(GraphConstructionHingeEmbeddingLoss(), td1) == approx(
        {"attractive": 0.7307405975481213, "repulsive": 11.076146539572338}
    )


def test_hinge_loss_legacy():
    assert get_ml_loss(
        GraphConstructionHingeEmbeddingLoss(rep_normalization="n_rep_edges"), td1
    ) == approx({"attractive": 0.7307405975481213, "repulsive": 0.34612957938781874})


def test_condensation_loss_padding_invariant():
    """Losses must be invariant under padding — the core correctness property
    of the masked static-shape design."""
    n = td1.beta.shape[0]
    pad = 14
    padded = MockData(
        beta=jnp.concatenate([td1.beta, jnp.full(pad, 0.5)]),
        x=jnp.concatenate([td1.x, jnp.zeros((pad, 3))]),
        particle_id=jnp.concatenate([td1.particle_id, jnp.full(pad, -1, dtype=td1.particle_id.dtype)]),
        pred=None,
        truth=None,
        pt=jnp.concatenate([td1.pt, jnp.zeros(pad)]),
        eta=jnp.concatenate([td1.eta, jnp.zeros(pad)]),
        reconstructable=jnp.concatenate([td1.reconstructable, jnp.zeros(pad)]),
        batch=jnp.zeros(n + pad, dtype=jnp.int32),
        true_edge_index=td1.true_edge_index,
    )
    node_mask = jnp.arange(n + pad) < n
    loss_fct = CondensationLossTiger(max_n_objects=16)
    padded_losses = to_floats(
        loss_fct(
            beta=padded.beta,
            x=padded.x,
            particle_id=padded.particle_id,
            reconstructable=padded.reconstructable,
            pt=padded.pt,
            eta=padded.eta,
            node_mask=node_mask,
        ).loss_dct
    )
    assert padded_losses == approx(_td1_c_losses)


def test_condensation_loss_f32_close():
    """The production (f32) path stays within float32 tolerance of the pins."""
    losses = to_floats(
        CondensationLossTiger(max_n_objects=16)(
            beta=td2.beta.astype(jnp.float32),
            x=td2.x.astype(jnp.float32),
            particle_id=td2.particle_id,
            reconstructable=td2.reconstructable.astype(jnp.float32),
            pt=td2.pt.astype(jnp.float32),
            eta=td2.eta.astype(jnp.float32),
        ).loss_dct
    )
    assert losses == approx(_td2_c_losses, rel=1e-3)


def test_condensation_loss_grad_finite():
    def scalar_loss(beta, x):
        r = CondensationLossTiger(max_n_objects=16)(
            beta=beta,
            x=x,
            particle_id=td1.particle_id,
            reconstructable=td1.reconstructable,
            pt=td1.pt,
            eta=td1.eta,
        )
        return r.loss

    g_beta, g_x = jax.grad(scalar_loss, argnums=(0, 1))(td1.beta, td1.x)
    assert np.isfinite(np.asarray(g_beta)).all()
    assert np.isfinite(np.asarray(g_x)).all()


def test_pin_hinge_loss_grad_finite():
    def scalar_loss(x):
        return GraphConstructionHingeEmbeddingLoss()(
            x=x,
            particle_id=td1.particle_id,
            reconstructable=td1.reconstructable,
            pt=td1.pt,
            eta=td1.eta,
            batch=td1.batch,
            true_edge_index=td1.true_edge_index,
        ).loss

    g = jax.grad(scalar_loss)(td1.x)
    assert np.isfinite(np.asarray(g)).all()


def test_condensation_loss_object_blocking():
    """Chunked (memory-safe) object blocks must reproduce the pinned values."""
    assert get_condensation_loss(td2, object_block_size=4) == approx(_td2_c_losses)
    assert get_condensation_loss(td1, object_block_size=8) == approx(_td1_c_losses)


def test_condensation_loss_max_n_rep(td=td2):
    """Repulsive-pair subsampling: expectation stays near the full value."""
    import jax

    full = get_condensation_loss(td)
    loss_fct = CondensationLossTiger(max_n_objects=16, max_n_rep=500)
    vals = []
    for seed in range(5):
        r = loss_fct(
            beta=td.beta,
            x=td.x,
            particle_id=td.particle_id,
            reconstructable=td.reconstructable,
            pt=td.pt,
            eta=td.eta,
            rng=jax.random.PRNGKey(seed),
        )
        vals.append(float(r.loss_dct["repulsive"]))
    assert np.mean(vals) == approx(full["repulsive"], rel=0.3)


def test_old_hinge_loss_smoke():
    from gnn_tracking_tpu.losses.metric_learning import (
        OldGraphConstructionHingeEmbeddingLoss,
    )

    r = OldGraphConstructionHingeEmbeddingLoss()(
        x=td1.x,
        particle_id=td1.particle_id,
        batch=td1.batch,
        true_edge_index=td1.true_edge_index,
        pt=td1.pt,
    )
    vals = to_floats(r.loss_dct)
    assert np.isfinite(vals["attractive"])
    assert np.isfinite(vals["repulsive"])
    assert vals["attractive"] > 0
