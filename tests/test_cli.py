"""CLI smoke tests: YAML-config training round trip (analog of reference
tests/test_lightning_from_config_training.py) and data transformer."""

from pathlib import Path

import numpy as np
import pytest

from gnn_tracking_tpu.graph_construction.data_transformer import DataTransformer, ECCut
from gnn_tracking_tpu.training.run import cli_main
from gnn_tracking_tpu.utils.loading import load_graph, save_graph

from .test_training import make_graph


@pytest.fixture(scope="module")
def data_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_data")
    for split, seeds in [("train", [0, 1]), ("val", [2])]:
        d = root / split
        d.mkdir()
        for s in seeds:
            save_graph(make_graph(s), d / f"data{s}_s0.npz")
    return root


@pytest.mark.parametrize("name", ["tc.yml", "ml_hetero.yml", "ml_heteroenc.yml"])
def test_cli_fit_from_yaml(data_dirs, tmp_path, name):
    """Reference parity: tests/test_lightning_from_config_training.py:25-53
    smoke-fits every bundled config YAML, incl. the heterogeneous ML models."""
    template = Path(__file__).parent / "test_configs" / name
    config_text = template.read_text().replace("__TMPDIR__", str(data_dirs))
    cfg = tmp_path / name
    cfg.write_text(config_text)
    metrics = cli_main(["fit", "--config", str(cfg)])
    assert "total" in metrics
    assert np.isfinite(metrics["total"])


def test_data_transformer_ec_cut(data_dirs, tmp_path):
    def fake_ec(graph):
        rng = np.random.default_rng(0)
        return {"W": rng.random(graph.num_edges)}

    transformer = DataTransformer(ECCut(fake_ec, thld=0.5))
    out_dir = tmp_path / "transformed"
    transformer.process_directories([data_dirs / "train"], [out_dir])
    files = sorted(out_dir.glob("*.npz"))
    assert len(files) == 2
    g_in = load_graph(sorted((data_dirs / "train").glob("*.npz"))[0])
    g_out = load_graph(files[0])
    # cut keeps roughly half the edges, graph was compacted
    assert 0 < g_out.num_edges < g_in.num_edges
    assert bool(np.asarray(g_out.edge_mask).all())
    assert "ec_score" in g_out.extras
    assert (out_dir / "transform_config.yml").exists()


@pytest.mark.parametrize("name", ["ec.yml", "ml.yml", "tc.yml"])
def test_example_configs_instantiate(name):
    """Example configs build valid module/datamodule/trainer trees."""
    import yaml

    from gnn_tracking_tpu.training.run import build_from_config

    cfg = yaml.safe_load(
        (Path(__file__).parent.parent / "examples" / "configs" / name).read_text()
    )
    # point data at nonexistent dirs: instantiation must still work (setup
    # would fail, which is fine)
    module, datamodule, trainer = build_from_config(cfg)
    assert hasattr(module, "training_step")
    assert hasattr(datamodule, "train_dataloader")
