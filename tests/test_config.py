"""Config system: composition, interpolation, attribute access, mutation."""

import os

import pytest

from multiply_tpu.config import Config, load_config

CONFS = os.path.join(os.path.dirname(__file__), "..", "confs")


def test_compose_base_model_dataset():
    conf = load_config(os.path.join(CONFS, "synthetic_base.yaml"))
    assert conf.model.learning_rate == 3.0e-3
    assert conf.dataset.train.num_person == 2
    assert conf.seed == 42
    # interpolation: exp resolves to the train dataset name
    assert conf.exp == "Synthetic"


def test_reference_schema_confs_load():
    conf = load_config(os.path.join(CONFS, "taichi01_base.yaml"))
    assert conf.model.ray_sampler.N_samples == 64
    assert conf.model.implicit_network.dims == [256] * 8
    assert conf.dataset.train.data_dir == "taichi01_vitpose_openpose/"
    assert conf.run == "taichi01"


def test_overrides_deep_merge():
    conf = load_config(
        os.path.join(CONFS, "synthetic_base.yaml"),
        overrides={"model": {"ray_sampler": {"N_samples": 4}}},
    )
    assert conf.model.ray_sampler.N_samples == 4
    # untouched siblings survive
    assert conf.model.ray_sampler.N_samples_eval == 32


def test_get_with_default_and_contains():
    c = Config({"a": {"b": 1}})
    assert c.get("missing", 7) == 7
    assert c.a.get("b") == 1
    assert "a" in c and "z" not in c


def test_nested_item_assignment_mutates_underlying():
    c = Config({"a": {"b": 1}})
    c["a"]["b"] = 5
    assert c.a.b == 5
    c.a["c"] = {"d": 2}
    assert c["a"]["c"]["d"] == 2
