from pathlib import Path

import numpy as np
import pytest

from gat_tpu.train.checkpoint import (save_checkpoint, load_checkpoint,
                                      flatten_tree, unflatten_tree)

REF_MLP_CKPT = Path("/root/reference/version_1/data/checkpoints/mlp/"
                    "mlp_v1.0.0.ckpt")


def test_flatten_roundtrip(rng):
    tree = {"a": {"b": rng.normal(size=(3, 4)), "c": rng.normal(size=2)},
            "d": np.float32(1.5)}
    flat = flatten_tree(tree)
    assert set(flat) == {"a/b", "a/c", "d"}
    back = unflatten_tree(flat)
    np.testing.assert_array_equal(back["a"]["b"], tree["a"]["b"])


def test_checkpoint_roundtrip(tmp_path, rng):
    ckpt = {
        "meta": {"config_version": "1.0.0", "model_type": "mlp"},
        "config": {"features": {"type": "mfcc", "params": {"N_MFCC": 64}},
                   "target_sr": 11025, "clip_length": 0.5},
        "variables": {"params": {"dense_0": {
            "kernel": rng.normal(size=(65, 128)).astype(np.float32),
            "bias": np.zeros(128, np.float32)}}},
        "model_init_args": {"num_features": 65, "hidden_dim": 128},
        "train_loss_history": [1.0, 0.5],
        "epoch": 2,
        "reverse_map": {0: "A2", 1: "E2"},
        "num_classes": 2,
        "class_names": ["A2", "E2"],
        "scaler": {"mean": np.zeros(65, np.float32),
                   "scale": np.ones(65, np.float32)},
    }
    p = tmp_path / "m.gtckpt.npz"
    save_checkpoint(p, ckpt)
    back = load_checkpoint(p)
    assert back["meta"]["model_type"] == "mlp"
    assert back["config"]["target_sr"] == 11025
    assert back["epoch"] == 2
    assert back["reverse_map"] == {0: "A2", 1: "E2"}
    np.testing.assert_array_equal(
        back["variables"]["params"]["dense_0"]["kernel"],
        ckpt["variables"]["params"]["dense_0"]["kernel"])
    np.testing.assert_array_equal(back["scaler"]["scale"],
                                  np.ones(65, np.float32))


@pytest.mark.skipif(not REF_MLP_CKPT.exists(), reason="reference ckpt absent")
def test_load_reference_torch_ckpt_transparently():
    ck = load_checkpoint(REF_MLP_CKPT)
    assert ck["meta"]["model_type"] == "mlp"
    assert ck["num_classes"] == 47
    assert ck["config"]["target_sr"] == 11025


def test_missing_file():
    with pytest.raises(FileNotFoundError):
        load_checkpoint("/nonexistent/x.gtckpt")
