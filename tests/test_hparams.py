import os

import pytest

from hilcodec_tpu.utils import HParams, load_config, update_params


def test_nested_attribute_access():
    hp = HParams(a=1, b={"c": 2, "d": {"e": [1, 2, 3]}})
    assert hp.a == 1
    assert hp.b.c == 2
    assert hp.b.d.e == [1, 2, 3]
    assert hp["b"]["d"]["e"] == [1, 2, 3]
    assert "a" in hp and "z" not in hp
    assert hp.get("z", 7) == 7
    assert getattr(hp, "missing", None) is None


def test_update_params_literals_and_strings():
    hp = HParams(train={"lr": 1e-3, "sched": "cos"})
    update_params(hp, ["train.lr=5.0e-4", "train.sched=warmup",
                       "train.new_list=[1,2]", "model.depth=4"])
    assert hp.train.lr == 5.0e-4
    assert hp.train.sched == "warmup"       # non-literal stays a string
    assert hp.train.new_list == [1, 2]
    assert hp.model.depth == 4              # intermediate node auto-created


def test_reference_configs_load(reference_dir):
    for name in ("hilcodec_music.yaml", "hilcodec_speech.yaml",
                 "avocodo_music.yaml"):
        hp = load_config(os.path.join(reference_dir, "configs", name))
        assert "model_kwargs" in hp
        assert hp.data.sampling_rate == 24000
    hp = load_config(os.path.join(reference_dir, "configs",
                                  "hilcodec_music.yaml"))
    assert hp.model_kwargs.vq_kwargs.num_quantizers == 12
    assert hp.model_kwargs.strides == [8, 5, 4, 2]


def test_to_dict_roundtrip():
    src = {"a": 1, "b": {"c": [1, {"d": 2}]}}
    hp = HParams(**src)
    assert hp.to_dict() == src
