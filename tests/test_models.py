from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gat_tpu.models import MLP, CNN, mlp_dims, adaptive_avg_pool_2d
from gat_tpu.models.torch_import import (load_reference_ckpt,
                                         mlp_params_from_state_dict)

REF_MLP_CKPT = Path("/root/reference/version_1/data/checkpoints/mlp/"
                    "mlp_v1.0.0.ckpt")


def test_mlp_dims_schedule():
    assert mlp_dims(128, 2) == [128, 64]
    assert mlp_dims(128, 10) == [128, 64, 32, 16, 8]
    assert mlp_dims(16, 3) == [16, 8]
    assert mlp_dims(8, 5) == [8]


def test_mlp_forward_shapes(rng):
    model = MLP(num_features=65, num_classes=47)
    x = jnp.asarray(rng.normal(size=(4, 65)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (4, 47)


def test_cnn_forward_shapes(rng):
    model = CNN(num_classes=47)
    x = jnp.asarray(rng.normal(size=(2, 64, 22, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 47)
    # param count sanity: conv 1→32→64→128 (3x3) + fc 2048→256 + out 256→47
    n_params = sum(np.prod(p.shape) for p in
                   jax.tree_util.tree_leaves(variables["params"]))
    expected = (9 * 32 + 32) + (32 * 9 * 64 + 64) + (64 * 9 * 128 + 128) \
        + (32 + 32 + 64 + 64 + 128 + 128) \
        + (2048 * 256 + 256) + (256 * 47 + 47)
    assert n_params == expected


def test_adaptive_pool_matches_torch(rng):
    import torch
    x = rng.normal(size=(2, 8, 2, 16)).astype(np.float32)  # NHWC
    ours = np.asarray(adaptive_avg_pool_2d(jnp.asarray(x), (4, 4)))
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))  # NCHW
    ref = torch.nn.functional.adaptive_avg_pool2d(xt, (4, 4)).numpy()
    np.testing.assert_allclose(np.transpose(ours, (0, 3, 1, 2)), ref,
                               atol=1e-6)
    # upsampling case (W in < W out) and odd sizes
    x2 = rng.normal(size=(1, 7, 3, 4)).astype(np.float32)
    ours2 = np.asarray(adaptive_avg_pool_2d(jnp.asarray(x2), (4, 4)))
    ref2 = torch.nn.functional.adaptive_avg_pool2d(
        torch.from_numpy(np.transpose(x2, (0, 3, 1, 2))), (4, 4)).numpy()
    np.testing.assert_allclose(np.transpose(ours2, (0, 3, 1, 2)), ref2,
                               atol=1e-6)


def _numpy_mlp_forward(state_dict, x):
    """Golden forward pass straight from the torch state_dict arrays:
    Linear → LayerNorm(eps 1e-5) → LeakyReLU(0.1) ×2 → Linear."""
    h = x
    for base in (0, 4):
        w = state_dict[f"net.{base}.weight"].numpy()
        b = state_dict[f"net.{base}.bias"].numpy()
        h = h @ w.T + b
        g = state_dict[f"net.{base + 1}.weight"].numpy()
        bb = state_dict[f"net.{base + 1}.bias"].numpy()
        mu = h.mean(axis=-1, keepdims=True)
        var = h.var(axis=-1, keepdims=True)
        h = (h - mu) / np.sqrt(var + 1e-5) * g + bb
        h = np.where(h >= 0, h, 0.1 * h)
    w = state_dict["net.8.weight"].numpy()
    b = state_dict["net.8.bias"].numpy()
    return h @ w.T + b


@pytest.mark.skipif(not REF_MLP_CKPT.exists(), reason="reference ckpt absent")
def test_reference_mlp_weight_import_parity(rng):
    """Imported reference weights must reproduce the original model's
    logits (golden computed directly from the state_dict arrays)."""
    ck = load_reference_ckpt(REF_MLP_CKPT)
    params = mlp_params_from_state_dict(ck["model"], 128, 2, 0.1)
    model = MLP(num_features=65, hidden_dim=128, num_hidden_layers=2,
                num_classes=47, dropout=0.1)
    x = rng.normal(size=(8, 65)).astype(np.float32)
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    golden = _numpy_mlp_forward(ck["model"], x)
    np.testing.assert_allclose(ours, golden, atol=2e-4)
    # and prediction argmax identical
    np.testing.assert_array_equal(ours.argmax(axis=1), golden.argmax(axis=1))


@pytest.mark.skipif(not REF_MLP_CKPT.exists(), reason="reference ckpt absent")
def test_reference_ckpt_to_native_schema():
    from gat_tpu.models.torch_import import reference_ckpt_to_native
    native = reference_ckpt_to_native(REF_MLP_CKPT)
    assert native["meta"]["model_type"] == "mlp"
    assert native["config"]["target_sr"] == 11025
    assert native["num_classes"] == 47
    assert native["reverse_map"][27] == "E2"
    assert native["scaler"]["mean"].shape == (65,)
    assert "dense_0" in native["variables"]["params"]
    # scaler VALUE regression against the committed converted artifact:
    # the converter reads only the pickled StandardScaler's mean_/scale_
    # arrays (the sklearn-version warning is owned in
    # load_reference_ckpt on that basis), so a sklearn upgrade that
    # changed what unpickling yields would fail here loudly
    from gat_tpu.train.checkpoint import load_checkpoint
    from gat_tpu.config import MLP_CONFIG
    shipped = load_checkpoint(MLP_CONFIG.CHECKPOINTS_DIR
                              / MLP_CONFIG.REFERENCE_CKPT_NAME)
    np.testing.assert_array_equal(native["scaler"]["mean"],
                                  shipped["scaler"]["mean"])
    np.testing.assert_array_equal(native["scaler"]["scale"],
                                  shipped["scaler"]["scale"])


def test_softmax_regression_baseline_trains(rng):
    """The archive's third classical family: logistic regression via the
    unified Trainer."""
    from gat_tpu.models import SoftmaxRegression
    from gat_tpu.train import Trainer, ArrayDataLoader
    n, d, k = 200, 8, 3
    centers = rng.normal(size=(k, d)) * 5
    y = rng.integers(0, k, n)
    X = (centers[y] + rng.normal(size=(n, d))).astype(np.float32)
    dl = ArrayDataLoader(X[:160], y[:160], 32, seed=0)
    dl_val = ArrayDataLoader(X[160:], y[160:], 32, shuffle=False)
    model = SoftmaxRegression(num_features=d, num_classes=k)
    tr = Trainer(model, dl, dl_val, reverse_map={0: "a", 1: "b", 2: "c"},
                 model_type="logreg", seed=0, lr=0.1)
    tr.train(epochs=30, es_slope_limit=-1e9, verbose=False)
    acc, _ = tr.evaluate()
    assert acc > 0.9


def test_cnn_on_mfcc_images(rng):
    """The v0 history ran a CNN on MFCC 'images' (archive cnn_model.py,
    SURVEY §2.2) — the CNN accepts that input family directly."""
    import jax
    import jax.numpy as jnp
    from gat_tpu.ops.spectral import mfcc
    clips = jnp.asarray(rng.normal(0, 0.2, (4, 5512)).astype(np.float32))
    m = mfcc(clips, 11025, n_mfcc=32)            # (4, T=11, 32)
    img = jnp.transpose(m, (0, 2, 1))[..., None]  # (4, 32, 11, 1)
    model = CNN(num_classes=5, base_channels=4, num_blocks=2, hidden_dim=8)
    variables = model.init(jax.random.PRNGKey(0), img)
    out = model.apply(variables, img)
    assert out.shape == (4, 5)
