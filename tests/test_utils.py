"""Utility tests (analog of reference test_log.py, test_nomenclature.py,
test_versioning.py, test_dictionaries)."""

import numpy as np
import pytest

from gnn_tracking_tpu.training.logging_utils import MetricAccumulator, StandardError
from gnn_tracking_tpu.utils.dictionaries import (
    add_key_prefix,
    add_key_suffix,
    expand_grid,
    pivot_record_list,
    to_floats,
)
from gnn_tracking_tpu.utils.log import get_logger
from gnn_tracking_tpu.utils.math import zero_division_gives_nan
from gnn_tracking_tpu.utils.nomenclature import denote_pt, random_trial_name
from gnn_tracking_tpu.utils.oom import is_oom_error, tolerate_some_oom_errors
from gnn_tracking_tpu.utils.signature import tolerate_additional_kwargs
from gnn_tracking_tpu.utils.versioning import assert_version_geq, get_commit_hash


def test_logger_singleton():
    assert get_logger() is get_logger()


def test_denote_pt():
    assert denote_pt("eff") == "eff"
    assert denote_pt("eff", 0.9) == "eff_pt0.9"


def test_random_trial_name():
    name = random_trial_name()
    assert len(name.split("-")) == 3


def test_versioning():
    h = get_commit_hash()
    assert h == "invalid" or len(h) == 40
    assert_version_geq("0.0.1")
    with pytest.raises(AssertionError):
        assert_version_geq("999.0")


def test_dict_helpers():
    assert add_key_prefix({"a": 1}, "x_") == {"x_a": 1}
    assert add_key_suffix({"a": 1}, "_y") == {"a_y": 1}
    assert expand_grid({"a": [1, 2], "b": [3]}) == [
        {"a": 1, "b": 3},
        {"a": 2, "b": 3},
    ]
    assert pivot_record_list([{"a": 1}, {"a": 2}]) == {"a": [1, 2]}
    out = to_floats({"a": np.float64(1.5), "b": {"c": np.int32(2)}})
    assert out == {"a": 1.5, "b": {"c": 2.0}}


def test_zero_division():
    assert zero_division_gives_nan(1, 2) == 0.5
    assert np.isnan(zero_division_gives_nan(1, 0))


def test_signature_tolerance():
    @tolerate_additional_kwargs
    def f(a, b=2):
        return a + b

    assert f(a=1, b=3, nonsense=9) == 4


def test_standard_error():
    se = StandardError()
    for v in [1.0, 2.0, 3.0]:
        se(v)
    assert se.compute() == pytest.approx(np.std([1, 2, 3]) / np.sqrt(3))


def test_metric_accumulator():
    acc = MetricAccumulator()
    acc.update({"a": 1.0})
    acc.update({"a": 3.0, "b": float("nan")})
    out = acc.compute()
    assert out["a"] == 2.0
    assert "a_std" in out
    assert "b" not in out


def test_oom_tolerance():
    calls = []

    @tolerate_some_oom_errors
    def flaky(fail):
        calls.append(1)
        if fail:
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")
        return 42

    assert flaky(True) is None
    assert flaky(False) == 42
    assert is_oom_error(RuntimeError("RESOURCE_EXHAUSTED: foo"))
    assert not is_oom_error(ValueError("nope"))


def test_run_logger(tmp_path):
    from gnn_tracking_tpu.training.loggers import RunLogger

    logger = RunLogger(tmp_path, config={"x": 1}, csv=True)
    logger.log(1, {"loss": 0.5})
    logger.log(2, {"loss": 0.25})
    hist = logger.read_history()
    assert [h["loss"] for h in hist] == [0.5, 0.25]
    assert (tmp_path / "run_meta.json").exists()
    assert (tmp_path / "metrics.csv").read_text().count("\n") == 3


def test_hit_dropout_masks_consistent():
    """HitDropout: dropped hits disappear from node/edge/true-edge masks;
    shapes unchanged; deterministic in (seed, step)."""
    import numpy as np

    from gnn_tracking_tpu.utils.augmentation import Compose, HitDropout, PhiRotation

    from .test_training import make_graph

    g = make_graph(0)
    tr = HitDropout(p=0.3, seed=5)
    g2 = tr(g, step=7)
    assert g2.x.shape == g.x.shape
    nm, em = np.asarray(g2.node_mask), np.asarray(g2.edge_mask)
    src, dst = np.asarray(g2.edge_index)
    # no surviving edge touches a dropped node
    assert not (em & (~nm[src] | ~nm[dst])).any()
    tm = np.asarray(g2.true_edge_mask)
    ta, tb = np.asarray(g2.true_edge_index)
    assert not (tm & (~nm[ta] | ~nm[tb])).any()
    # some hits actually dropped, some survive
    assert 0 < nm.sum() < np.asarray(g.node_mask).sum()
    # deterministic
    g3 = HitDropout(p=0.3, seed=5)(g, step=7)
    np.testing.assert_array_equal(nm, np.asarray(g3.node_mask))
    # different step -> different pattern (overwhelmingly likely)
    g4 = tr(g, step=8)
    assert (np.asarray(g4.node_mask) != nm).any()

    # compose with rotation: both applied
    g5 = Compose([PhiRotation(seed=1), HitDropout(p=0.3, seed=5)])(g, step=7)
    np.testing.assert_array_equal(np.asarray(g5.node_mask), nm)
    assert (np.asarray(g5.x) != np.asarray(g.x)).any()
