"""Run-export (mlflow-surface parity) tests."""
import json

import numpy as np

from sleepgen.utils.export import (
    export_run,
    flatten_params,
    load_exported_params,
    unflatten_params,
)


def test_flatten_roundtrip():
    tree = {"a": {"b": np.ones(3), "c": np.zeros(2)}, "d": np.arange(4.0)}
    flat = flatten_params(tree)
    assert set(flat) == {"a/b", "a/c", "d"}
    back = unflatten_params(flat)
    np.testing.assert_array_equal(back["a"]["b"], tree["a"]["b"])
    np.testing.assert_array_equal(back["d"], tree["d"])


def test_export_run(tmp_path):
    run = tmp_path / "run"
    run.mkdir()
    (run / "config.yaml").write_text("a: 1")
    (run / "metrics_train.jsonl").write_text('{"step":0}\n')
    np.save(run / "sample_0.npy", np.zeros(3))

    params = {"layer": {"kernel": np.ones((2, 2))}}
    out = export_run(run, params=params, metrics={"fid": 1.5})
    manifest = json.loads((out / "manifest.json").read_text())
    assert manifest["has_model"] and manifest["metrics"]["fid"] == 1.5
    assert "config.yaml" in manifest["artifacts"]
    assert (out / "artifacts" / "sample_0.npy").exists()

    loaded = load_exported_params(out)
    np.testing.assert_array_equal(loaded["layer"]["kernel"], np.ones((2, 2)))
