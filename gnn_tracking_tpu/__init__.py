"""gnn_tracking_tpu: a TPU-native (JAX/XLA/Pallas) framework for GNN-based
charged-particle track reconstruction.

Re-designed from scratch for TPU hardware with the capability surface of the
``gnn-tracking`` reference framework (see SURVEY.md):

* point-cloud building from TrackML-style CSV events,
* geometric and metric-learning graph construction,
* interaction-network edge classification,
* object-condensation track finding,
* on-device clustering (DBSCAN / connected components) and tracking metrics,
* a training runtime (optax/orbax) with config-driven model assembly,
* multi-chip scaling via ``jax.sharding`` meshes.

Everything on the compute path is jittable: graphs are fixed-shape padded
pytrees; dynamic graph surgery from the reference (``edge_subgraph`` etc.) is
expressed as masking.
"""

__version__ = "0.1.0"
