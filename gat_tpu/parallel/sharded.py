"""Sharded end-to-end programs: batch inference and the training step
over a device mesh.

This is where ≥100× single-CPU throughput comes from (SURVEY §7 step 7):
thousands of clips per device step, batch sharded over the `data` axis.
Parameters are replicated (or tensor-sharded over `model` for the MLP's
hidden dimension as a generality demonstration — the models are small
enough that TP is never required, SURVEY §2.4). Everything is jit with
sharding annotations; XLA inserts the psum for gradient reduction and any
gathers the TP layout needs, riding ICI.
"""
from __future__ import annotations

import functools

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import MLP, CNN
from .mesh import MODEL, data_sharding, replicated

__all__ = ["make_sharded_transcribe", "make_sharded_transcribe_files",
           "mlp_tp_shardings", "make_sharded_train_step",
           "sharded_batch_pitch"]


def mlp_tp_shardings(params: dict, mesh: Mesh) -> dict:
    """Tensor-parallel layout for the MLP: hidden activations sharded over
    `model` — dense_0 kernel column-sharded, every later dense kernel
    row-sharded (XLA inserts the final all-reduce)."""
    def spec_for(path, leaf):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if leaf.ndim == 2:  # kernels
            if name.startswith("dense_0"):
                return P(None, MODEL)
            if name.startswith("dense_"):
                return P(MODEL, None) if name.endswith("kernel") else P()
            if name.startswith("out"):
                return P(MODEL, None)
        if leaf.ndim == 1 and (name.startswith("dense_")
                               or name.startswith("ln_")):
            return P(MODEL)
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for(path, leaf)),
        params)


def make_sharded_transcribe(predictor, scaler, mesh: Mesh, sr: int,
                            mfcc_params: dict,
                            melspec_params: dict | None):
    """One jit program: clip batch (sharded over `data`) → ensemble probs
    + YIN pitch. Weights replicated across the mesh; the ensemble recipe
    itself comes from infer.pipeline (single source of truth)."""
    from ..infer.pipeline import build_clip_ensemble_fn
    from ..ops.yin import yin_pitch
    predictor.mlp_variables = jax.device_put(predictor.mlp_variables,
                                             replicated(mesh))
    if predictor.cnn_variables is not None:
        predictor.cnn_variables = jax.device_put(predictor.cnn_variables,
                                                 replicated(mesh))
    ensemble = build_clip_ensemble_fn(predictor, scaler, sr, mfcc_params,
                                      melspec_params)

    @functools.partial(jax.jit,
                       in_shardings=(data_sharding(mesh, 2),),
                       out_shardings=(data_sharding(mesh, 2),
                                      data_sharding(mesh, 1)))
    def run(clips):
        return ensemble(clips), yin_pitch(clips, sr)

    return run


def make_sharded_transcribe_files(transcriber, mesh: Mesh,
                                  target_sr: int, clip_duration: float,
                                  max_onsets: int):
    """The whole-FILE fused program (gating → onsets → slicing →
    re-rate → ensemble → YIN) data-parallel over the mesh: the file
    batch shards over `data`, so each device segments and transcribes
    its own recordings end-to-end with no cross-device traffic (weights
    replicated; vmap'd greedy onset scans advance each device's lanes
    locally). fn(ys (B, n), n_valids (B,)) → per-file (B, K, ...)."""
    from ..infer.pipeline import build_files_fn
    pred = transcriber.predictor
    pred.mlp_variables = jax.device_put(pred.mlp_variables,
                                        replicated(mesh))
    if pred.cnn_variables is not None:
        pred.cnn_variables = jax.device_put(pred.cnn_variables,
                                            replicated(mesh))
    mfcc_params, melspec_params = transcriber._feature_params()
    if "cnn" not in transcriber.model_ckpts:
        melspec_params = None
    body = build_files_fn(pred, transcriber.scaler, transcriber.ckpt_sr,
                          mfcc_params, melspec_params, target_sr,
                          clip_duration, max_onsets)
    return jax.jit(body, in_shardings=(data_sharding(mesh, 2),
                                       data_sharding(mesh, 1)))


def sharded_batch_pitch(mesh: Mesh, sr: int):
    """Data-parallel YIN over a clip batch (the DSP baseline at scale)."""
    from ..ops.yin import yin_pitch

    @functools.partial(jax.jit, in_shardings=(data_sharding(mesh, 2),),
                       out_shardings=data_sharding(mesh, 1))
    def run(clips):
        return yin_pitch(clips, sr)
    return run


def make_sharded_train_step(model, tx, mesh: Mesh,
                            label_smoothing: float = 0.05,
                            tp_mlp: bool = False):
    """jit training step over the mesh: batch sharded on `data`, params
    replicated (or TP-sharded for the MLP when tp_mlp). The gradient
    all-reduce is inserted by XLA from the sharding alone."""
    has_bn = isinstance(model, CNN)

    def step(params, extra, opt_state, xb, yb, rng):
        def loss_fn(p):
            variables = {"params": p, **extra}
            if has_bn:
                logits, mut = model.apply(variables, xb, train=True,
                                          rngs={"dropout": rng},
                                          mutable=["batch_stats"])
            else:
                logits = model.apply(variables, xb, deterministic=False,
                                     rngs={"dropout": rng})
                mut = extra
            one_hot = jax.nn.one_hot(yb, logits.shape[-1])
            soft = optax.smooth_labels(one_hot, label_smoothing)
            return optax.softmax_cross_entropy(logits, soft).mean(), mut
        (loss, mut), grads = jax.value_and_grad(loss_fn,
                                                has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, mut, opt_state, loss

    def prepare(params, extra, opt_state):
        """Place trees on the mesh with the chosen layouts."""
        if tp_mlp and isinstance(model, MLP):
            p_shard = mlp_tp_shardings(params, mesh)
            params = jax.tree_util.tree_map(jax.device_put, params, p_shard)
            opt_state = jax.device_put(opt_state, replicated(mesh))
        else:
            params = jax.device_put(params, replicated(mesh))
            opt_state = jax.device_put(opt_state, replicated(mesh))
        extra = jax.device_put(extra, replicated(mesh))
        return params, extra, opt_state

    jit_step = jax.jit(step)
    return jit_step, prepare
