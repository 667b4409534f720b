"""Trainer: jit-compiled training for the MLP and CNN classifiers.

Behavioral spec: prototyping/source/training/mlp_trainer.py:110-514 and
cnn_trainer.py:142-563 (C12/C13). Same recipe, TPU-native execution:

  * one jit `train_step` per batch shape: forward + CE(label smoothing
    0.05) + backward + global-norm clip(1.0) + AdamW(lr 1e-3, wd 1e-4),
    with the gradient norm computed in-graph (the reference recomputes it
    in a Python loop over parameters, ref mlp_trainer.py:327-333)
  * ReduceLROnPlateau(factor .5, patience 3, rel threshold 1e-4) — the
    learning rate is an injected hyperparameter, so LR drops don't
    recompile
  * slope-based early stopping: np.polyfit over the last `es_window_len`
    val losses once past 1.5× the window, stop when slope ≥ limit
    (ref mlp_trainer.py:350-363, including its check-before-append
    ordering)
  * Kaiming-normal(a=0.01) weight init, zero biases
    (ref mlp_trainer.py:155-159)
  * the CUDA-AMP path (ref cnn_trainer.py:321-358) maps to bfloat16
    compute via the CNN's dtype — no GradScaler needed; TPU bf16 keeps
    fp32 range

Checkpoints carry the full C15 schema plus optimizer state for resume.
"""
from __future__ import annotations

import functools
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import (CONFIG_VERSION, TARGET_SR, CLIP_DURATION,
                      MFCC_CONFIG, MELSPEC_CONFIG, MLP_CONFIG, CNN_CONFIG,
                      config_dict)
from .checkpoint import save_checkpoint, load_checkpoint
from .metrics import confusion_matrix, classification_report, plot_curves

__all__ = ["ReduceLROnPlateau", "Trainer", "kaiming_reinit"]


class ReduceLROnPlateau:
    """torch.optim.lr_scheduler.ReduceLROnPlateau semantics (mode='min',
    threshold_mode='rel') — ref mlp_trainer.py:129-134."""

    def __init__(self, init_lr: float, factor: float = 0.5,
                 patience: int = 3, threshold: float = 1e-4,
                 min_lr: float = 0.0):
        self.lr = float(init_lr)
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = float("inf")
        self.num_bad = 0

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.num_bad = 0
        return self.lr


@functools.partial(jax.jit, static_argnames="n")
def _split_chain(key, n: int):
    """`n` sequential `jax.random.split` steps as ONE device dispatch:
    returns (advanced_key, (n, 2) subkeys), bitwise-identical to the
    host loop `for _ in range(n): key, sub = split(key)` (split is
    deterministic) — the scanned-epoch path uses this so deriving
    per-batch dropout keys costs one round trip, not n."""
    def step(k, _):
        k, sub = jax.random.split(k)
        return k, sub
    return jax.lax.scan(step, key, None, length=n)


def _kaiming_std(fan_in: int, a: float = 0.01) -> float:
    return float(np.sqrt(2.0 / (1.0 + a * a)) / np.sqrt(fan_in))


def kaiming_reinit(params, key) -> dict:
    """Kaiming-normal(a=0.01, fan_in) on every kernel, zeros on biases
    (ref mlp_trainer.py:155-159, cnn_trainer.py:194)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    keys = jax.random.split(key, len(flat))
    new_leaves = []
    for (path, leaf), k in zip(flat, keys):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "kernel" and leaf.ndim >= 2:
            fan_in = int(np.prod(leaf.shape[:-1]))
            new_leaves.append(
                jax.random.normal(k, leaf.shape, leaf.dtype)
                * _kaiming_std(fan_in))
        elif name == "bias":
            new_leaves.append(jnp.zeros_like(leaf))
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


class Trainer:
    """Unified MLP/CNN trainer (the reference keeps two near-identical
    classes; the only structural difference — BatchNorm state and AMP —
    is handled by the variables tree and the model dtype)."""

    # whole-set eval dispatch granularity (examples per device call on
    # the fast path); class attr so tests can shrink it
    _EVAL_CHUNK = 65536
    # largest val set kept device-resident across per-epoch evaluate
    # calls (float32 feature bytes); larger sets stream host slices per
    # chunk instead of pinning the whole set in HBM (replicated per
    # device under a mesh)
    _EVAL_RESIDENT_BYTES = 1 << 29  # 512 MB

    def __init__(self, model, train_dl, val_dl=None, reverse_map=None,
                 lr: float = 1e-3, weight_decay: float = 1e-4,
                 scaler=None, seed: int = 0, label_smoothing: float = 0.05,
                 max_clip_norm: float = 1.0, model_type: str | None = None,
                 mesh=None):
        """`mesh` (a jax.sharding.Mesh, e.g. parallel.make_mesh(N)) runs
        every train/eval step data-parallel over the mesh's `data` axis:
        params/optimizer state replicated, each batch sharded across
        devices, the gradient all-reduce inserted by XLA from the sharding
        alone (SURVEY §2.4 DP plan). The math is the single-device math —
        same batches, same order, same dropout keys — up to float
        reassociation in the batch reductions (tested ~1e-6 relative in
        tests/test_parallel.py); mesh=None is the plain jit path."""
        self.model = model
        self.mesh = mesh
        self.model_type = model_type or type(model).__name__.lower()
        self.train_dl = train_dl
        self.val_dl = val_dl
        self.scaler = scaler
        self.label_smoothing = label_smoothing

        self.reverse_map = reverse_map
        self.class_names = ([str(reverse_map[k])
                             for k in sorted(reverse_map)]
                            if reverse_map else [])
        self.num_classes = len(self.class_names) or model.num_classes

        self._check_dims(train_dl)
        if val_dl is not None:
            self._check_dims(val_dl)

        xb, _ = next(iter(train_dl))
        key = jax.random.PRNGKey(seed)
        k_init, k_w, self._dropout_key = jax.random.split(key, 3)
        variables = model.init(k_init, jnp.asarray(xb[:1], jnp.float32))
        params = kaiming_reinit(variables["params"], k_w)
        self.params = params
        self.extra = {k: v for k, v in variables.items() if k != "params"}
        self._has_bn = "batch_stats" in self.extra

        self.tx = optax.chain(
            optax.clip_by_global_norm(max_clip_norm),
            optax.inject_hyperparams(optax.adamw)(
                learning_rate=lr, weight_decay=weight_decay))
        self.opt_state = self.tx.init(self.params)
        if mesh is not None:
            from ..parallel.mesh import replicated
            rep = replicated(mesh)
            self.params = jax.device_put(self.params, rep)
            self.extra = jax.device_put(self.extra, rep)
            self.opt_state = jax.device_put(self.opt_state, rep)
        self.scheduler = ReduceLROnPlateau(lr)

        self.train_loss_history: list[float] = []
        self.train_accuracy_history: list[float] = []
        self.val_loss_history: list[float] = []
        self.val_accuracy_history: list[float] = []
        self.epoch = 0

        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()
        self._epoch_fn = None      # built lazily on first scanned epoch
        # single-entry device-data cache for the scanned epoch:
        # (loader, X, y, X_dev, Y_dev) — the loader and its host arrays
        # are pinned by STRONG reference and compared by identity, so a
        # recycled id() or a swapped-in same-length dataset can never
        # alias to stale device data, and holding one entry bounds
        # device memory across train() calls on different loaders
        self._dev_data: tuple | None = None
        # same single-entry identity-keyed cache for the whole-val-set
        # eval dispatch (finding: the fast path re-uploaded dl.X every
        # epoch); reset alongside _dev_data at each train() call
        self._val_data: tuple | None = None
        # True only inside train()'s epoch loop: gates _val_data reuse
        # (direct public evaluate() calls re-upload — see evaluate())
        self._in_train = False

    # ------------------------------------------------------------------
    def _check_dims(self, dl):
        """Input/feature-dim guards (ref mlp_trainer.py:161-171,
        cnn_trainer.py:183-191)."""
        if len(dl) == 0:
            raise ValueError("[_check_dims] Provided DataLoader is empty.")
        xb, _ = next(iter(dl))
        if hasattr(self.model, "num_features"):  # vector models (MLP, …)
            if xb.shape[1] != self.model.num_features:
                raise ValueError(
                    f"[_check_dims] Input feature dimension mismatch: "
                    f"DataLoader provides {xb.shape[1]}, but model expects "
                    f"{self.model.num_features}")
        else:
            if xb.ndim != 4:
                raise ValueError(
                    f"[_check_dims] CNN expects rank-4 input, got "
                    f"{xb.ndim}-D")

    def _shard_batch(self, xb, yb):
        """Inside-jit data-parallel annotation: shard the batch over the
        mesh's `data` axis (no-op without a mesh). Params stay replicated,
        so XLA derives the per-shard gradient psum on its own."""
        if self.mesh is None:
            return xb, yb
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel.mesh import DATA
        xs = NamedSharding(self.mesh, P(DATA, *([None] * (xb.ndim - 1))))
        ys = NamedSharding(self.mesh, P(DATA))
        return (jax.lax.with_sharding_constraint(xb, xs),
                jax.lax.with_sharding_constraint(yb, ys))

    def _apply_train(self, params, extra, xb, rng):
        variables = {"params": params, **extra}
        if self._has_bn:
            logits, mut = self.model.apply(variables, xb, train=True,
                                           rngs={"dropout": rng},
                                           mutable=["batch_stats"])
            return logits, mut
        logits = self.model.apply(variables, xb, deterministic=False,
                                  rngs={"dropout": rng})
        return logits, extra

    def _apply_eval(self, params, extra, xb):
        variables = {"params": params, **extra}
        if self._has_bn:
            return self.model.apply(variables, xb, train=False)
        return self.model.apply(variables, xb, deterministic=True)

    def _loss(self, logits, yb):
        one_hot = jax.nn.one_hot(yb, logits.shape[-1])
        soft = optax.smooth_labels(one_hot, self.label_smoothing)
        return optax.softmax_cross_entropy(logits, soft).mean()

    def _step_body(self, params, extra, opt_state, xb, yb, rng):
        xb, yb = self._shard_batch(xb, yb)

        def loss_fn(p):
            logits, mut = self._apply_train(p, extra, xb, rng)
            return self._loss(logits, yb), (logits, mut)
        (loss, (logits, mut)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        gnorm = optax.global_norm(grads)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        correct = jnp.sum(jnp.argmax(logits, axis=-1) == yb)
        return params, mut, opt_state, loss, correct, gnorm

    def _build_train_step(self):
        return jax.jit(self._step_body)

    def _build_epoch_fn(self):
        """ONE dispatch per epoch: lax.scan of the train step over the
        epoch's batch indices, with X/Y resident on device — instead of
        one dispatch (plus a loss sync) per 32-clip batch (VERDICT r2
        §next-5; the reference's loop is one optimizer step per batch,
        ref mlp_trainer.py:307-316 — semantics preserved exactly, the
        scan carries (params, batch_stats, opt_state) through the same
        sequential updates)."""
        def epoch(params, extra, opt_state, X, Y, perm, rngs):
            def body(carry, xs):
                params, extra, opt_state = carry
                jdx, rng = xs
                xb = jnp.take(X, jdx, axis=0)
                yb = jnp.take(Y, jdx, axis=0)
                params, extra, opt_state, loss, correct, gnorm = \
                    self._step_body(params, extra, opt_state, xb, yb, rng)
                return (params, extra, opt_state), (loss, correct, gnorm)
            (params, extra, opt_state), (losses, corrects, gnorms) = \
                jax.lax.scan(body, (params, extra, opt_state), (perm, rngs))
            return params, extra, opt_state, losses, corrects, gnorms
        return jax.jit(epoch)

    def _build_eval_step(self):
        def step(params, extra, xb, yb):
            xb, yb = self._shard_batch(xb, yb)
            logits = self._apply_eval(params, extra, xb)
            loss = self._loss(logits, yb)
            preds = jnp.argmax(logits, axis=-1)
            return loss, jnp.sum(preds == yb), preds
        return jax.jit(step)

    @staticmethod
    def _with_lr(state, lr: float):
        """Return `state` with its injected learning_rate replaced, or
        None if this state doesn't carry one."""
        hp = getattr(state, "hyperparams", None)
        if isinstance(hp, dict) and "learning_rate" in hp:
            hp = dict(hp)
            hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
            return state._replace(hyperparams=hp)
        return None

    def _set_lr(self, lr: float):
        """Inject the new LR into whichever state carries the injected
        `learning_rate` hyperparameter — the state itself (bare
        inject_hyperparams optimizer) or a scan over the chain elements,
        not a positional poke, so reordering the optax chain cannot
        silently bind to the wrong state."""
        direct = self._with_lr(self.opt_state, lr)
        if direct is not None:
            self.opt_state = direct
            return
        states, found = [], False
        for s in self.opt_state:
            if not found:
                replaced = self._with_lr(s, lr)
                if replaced is not None:
                    s = replaced
                    found = True
            states.append(s)
        if not found:
            raise RuntimeError(
                "[_set_lr] optimizer chain has no injected 'learning_rate' "
                "hyperparameter — was the optimizer built without "
                "optax.inject_hyperparams?")
        self.opt_state = tuple(states)

    def _put(self, a):
        """device_put honoring the mesh: whole-dataset arrays are
        REPLICATED (each device slices only its shard of every batch via
        the in-step sharding constraint — at this data scale HBM is ample
        and replication keeps the shuffled gather local)."""
        if self.mesh is None:
            return jax.device_put(a)
        from ..parallel.mesh import replicated
        return jax.device_put(a, replicated(self.mesh))

    # ------------------------------------------------------------------
    def _dev_cached(self, attr: str, dl):
        """Identity-keyed device upload of (dl.X, dl.y), cached on
        `self.<attr>` — ONE definition of the cache-check/refresh idiom
        for the train and eval paths, so the reset/mutation semantics
        live in one place. The key is object identity (loader, X, y):
        cheap, but blind to IN-PLACE mutation — callers own the reset
        discipline (train() clears both slots per call; evaluate()
        clears its slot on direct public calls)."""
        c = getattr(self, attr)
        if not (c and c[0] is dl and c[1] is dl.X and c[2] is dl.y):
            setattr(self, attr, (
                dl, dl.X, dl.y,
                self._put(jnp.asarray(dl.X, jnp.float32)),
                self._put(jnp.asarray(dl.y))))
            c = getattr(self, attr)
        return c[3], c[4]

    def _run_epoch_scanned(self, train_dl):
        """One epoch as ONE device dispatch (plus at most one extra for a
        partial trailing batch): same batches, same order, same dropout
        keys, same sequential optimizer updates as the per-batch loop —
        just scanned on device with X/Y resident. Returns
        (loss_sum, correct, total)."""
        from .data import ArrayDataLoader  # noqa: F401 (type check only)
        X_dev, Y_dev = self._dev_cached("_dev_data", train_dl)
        if self._epoch_fn is None:
            self._epoch_fn = self._build_epoch_fn()

        idx = np.arange(len(train_dl.X))
        if train_dl.shuffle:
            train_dl._rng.shuffle(idx)  # same rng stream as iteration
        bs = train_dl.batch_size
        nb = len(idx) // bs
        loss_sum, correct, total = 0.0, 0, 0
        if nb:
            perm = jnp.asarray(idx[:nb * bs].reshape(nb, bs))
            # per-batch dropout keys as ONE dispatch: a host loop of nb
            # sequential jax.random.split calls is nb tiny device round
            # trips (~30 ms each through a tunneled TPU) before the
            # scanned epoch even starts; the scan below produces the
            # bitwise-identical key sequence (split is deterministic)
            self._dropout_key, rngs = _split_chain(self._dropout_key, nb)
            (self.params, self.extra, self.opt_state, losses, corrects,
             gnorms) = self._epoch_fn(self.params, self.extra,
                                      self.opt_state, X_dev, Y_dev,
                                      perm, rngs)
            loss_sum += float(jnp.sum(losses)) * bs
            correct += int(jnp.sum(corrects))
            total += nb * bs
            self.last_grad_norm = float(gnorms[-1])
        rem = idx[nb * bs:]
        if len(rem) and not train_dl.drop_last:
            self._dropout_key, sub = jax.random.split(self._dropout_key)
            (self.params, self.extra, self.opt_state, loss, corr,
             gnorm) = self._train_step(
                self.params, self.extra, self.opt_state,
                jnp.take(X_dev, jnp.asarray(rem), axis=0),
                jnp.take(Y_dev, jnp.asarray(rem), axis=0), sub)
            loss_sum += float(loss) * len(rem)
            correct += int(corr)
            total += len(rem)
            self.last_grad_norm = float(gnorm)
        return loss_sum, correct, total

    def train(self, epochs: int = 20, train_dl=None, es_window_len: int = 4,
              es_slope_limit: float = 1e-5, plot_metrics: bool = False,
              verbose: bool = True, scan_epoch: bool = True):
        """Epoch loop with per-epoch validation, plateau LR, slope-based
        early stop (ref mlp_trainer.py:287-383). `scan_epoch` runs each
        epoch as one scanned device dispatch when the loader is a plain
        ArrayDataLoader (identical math; ~n_batches× fewer dispatches and
        loss syncs — the reference pays one optimizer step + host sync
        per 32-clip batch); pass False to force the per-batch loop."""
        from .data import ArrayDataLoader
        # `is None` test, not truthiness: a zero-length drop_last loader is
        # falsy via __len__ and would silently fall through to the default
        train_dl = self.train_dl if train_dl is None else train_dl
        if train_dl is None:
            print("[train] No train dataloader provided. Exiting [train].")
            return
        self._check_dims(train_dl)
        if verbose:
            print("[train] Training start.")
        t0 = time.time()
        self.last_grad_norm = 0.0
        use_scan = scan_epoch and type(train_dl) is ArrayDataLoader
        # the device copy is reused across THIS call's epochs only: a
        # caller may mutate X/y in place between train() calls (object
        # identity unchanged), so cross-call reuse would train on stale
        # uploads while the per-batch path honored the mutation
        self._dev_data = None
        self._val_data = None

        self._in_train = True  # evaluate() may reuse _val_data per-call
        try:
            self._train_epochs(epochs, train_dl, use_scan, es_window_len,
                               es_slope_limit, verbose)
        finally:
            self._in_train = False

        if plot_metrics:
            plot_curves({"Accuracy": self.train_accuracy_history,
                         "Loss": self.train_loss_history},
                        title="Training Curves")
            plot_curves({"Accuracy": self.val_accuracy_history,
                         "Loss": self.val_loss_history},
                        title="Validation Curves")
        if verbose:
            print(f"\n[train] Training complete. "
                  f"({time.time() - t0:.1f}s)\n")

    def _train_epochs(self, epochs, train_dl, use_scan, es_window_len,
                      es_slope_limit, verbose):
        for ep in range(1, epochs + 1):
            if verbose:
                print(f"[train] EPOCH {ep}/{epochs}")
            if use_scan:
                loss_sum, correct, total = self._run_epoch_scanned(train_dl)
            else:
                loss_sum, correct, total = 0.0, 0, 0
                for xb, yb in train_dl:
                    self._dropout_key, sub = jax.random.split(
                        self._dropout_key)
                    (self.params, self.extra, self.opt_state, loss, corr,
                     gnorm) = self._train_step(
                        self.params, self.extra, self.opt_state,
                        jnp.asarray(xb, jnp.float32), jnp.asarray(yb), sub)
                    bs = len(yb)
                    loss_sum += float(loss) * bs
                    correct += int(corr)
                    total += bs
                    self.last_grad_norm = float(gnorm)

            epoch_loss = loss_sum / total if total else 0.0
            epoch_acc = correct / total if total else 0.0
            self.train_loss_history.append(epoch_loss)
            self.train_accuracy_history.append(epoch_acc)
            self.epoch += 1

            val_acc, val_loss = self.evaluate()
            if val_loss is not None:
                self._set_lr(self.scheduler.step(val_loss))

                # early-stop check precedes appending this epoch's metrics
                # (reference ordering, mlp_trainer.py:350-363)
                if ep > int(es_window_len * 1.5):
                    last_losses = self.val_loss_history[-es_window_len:]
                    if len(last_losses) >= 2:
                        slope, _ = np.polyfit(
                            np.arange(len(last_losses)), last_losses, 1)
                        if verbose:
                            print(f"[train] early stop slope value: "
                                  f"{slope:.4f}, over last "
                                  f"{es_window_len} epochs")
                        if slope >= es_slope_limit:
                            if verbose:
                                print("[train] early stop triggered: loss "
                                      "no longer decreasing")
                            break

                self.val_accuracy_history.append(val_acc)
                self.val_loss_history.append(val_loss)
                if verbose:
                    print(f"[train] train loss: {epoch_loss:.4f} | "
                          f"train accuracy: {epoch_acc:.4f} | "
                          f"val loss: {val_loss:.4f} | "
                          f"val accuracy: {val_acc:.4f}")

    def evaluate(self, val_dl=None, cm: bool = False, report: bool = False,
                 plot_metrics: bool = False):
        """Weighted val loss + accuracy; optional confusion matrix /
        classification report (ref mlp_trainer.py:393-432)."""
        from .data import ArrayDataLoader
        # `is None`, not truthiness: an explicitly passed zero-length
        # drop_last loader is falsy via __len__ and must NOT be silently
        # swapped for the default loader (wrong-dataset metrics)
        dl = self.val_dl if val_dl is None else val_dl
        if dl is None:
            print("[evaluate] No val dataloader provided.")
            return None, None
        correct, total, loss_sum = 0, 0, 0.0
        preds_all, y_all = [], []
        if (type(dl) is ArrayDataLoader and not dl.shuffle
                and not dl.drop_last):
            # whole val set in ONE dispatch (chunked at 64k examples so
            # a huge set neither silently reverts to the per-batch loop —
            # the round-3 behavior above a hard 8192 cap — nor risks one
            # giant intermediate buffer): the size-weighted loss
            # recombination equals the global mean, so numbers are
            # identical to the loop below (drop_last loaders skip the
            # fast path — the loop's trailing-batch drop is part of
            # their contract)
            n = len(dl.y)
            chunk = self._EVAL_CHUNK
            # whole-set device residency (cached across the per-epoch
            # evaluate calls — one upload per training run) is bounded:
            # a val set past _EVAL_RESIDENT_BYTES streams host slices
            # per chunk instead, paying re-upload per epoch rather than
            # pinning gigabytes in HBM (replicated per device on a mesh)
            resident = (np.asarray(dl.X).nbytes
                        <= self._EVAL_RESIDENT_BYTES)
            if resident:
                if not self._in_train:
                    # the identity-keyed cache cannot see IN-PLACE
                    # mutation of dl.X/dl.y (the hazard _dev_cached
                    # documents); inside train() the per-call reset
                    # makes reuse safe across that call's epochs, but a
                    # direct public evaluate() must never report
                    # metrics for a stale upload — re-upload instead
                    self._val_data = None
                X_dev, Y_dev = self._dev_cached("_val_data", dl)
            for i in range(0, n, chunk):
                if resident:
                    xc, yc = X_dev[i:i + chunk], Y_dev[i:i + chunk]
                else:
                    xc = self._put(jnp.asarray(dl.X[i:i + chunk],
                                               jnp.float32))
                    yc = self._put(jnp.asarray(dl.y[i:i + chunk]))
                loss, corr, preds = self._eval_step(
                    self.params, self.extra, xc, yc)
                bs = min(chunk, n - i)
                loss_sum += float(loss) * bs
                correct += int(corr)
                preds_all.extend(np.asarray(preds))
            total = n
            y_all = list(dl.y)
            dl = ()  # skip the loop
        for xb, yb in dl:
            loss, corr, preds = self._eval_step(
                self.params, self.extra, jnp.asarray(xb, jnp.float32),
                jnp.asarray(yb))
            bs = len(yb)
            loss_sum += float(loss) * bs
            correct += int(corr)
            total += bs
            preds_all.extend(np.asarray(preds))
            y_all.extend(np.asarray(yb))
        acc = correct / total if total else 0.0
        avg_loss = loss_sum / total if total else 0.0
        if cm:
            print(confusion_matrix(y_all, preds_all, self.num_classes))
        if report:
            print(classification_report(y_all, preds_all, self.class_names))
        return acc, avg_loss

    def predict(self, xb):
        logits = self._apply_eval(self.params, self.extra,
                                  jnp.asarray(xb, jnp.float32))
        return np.asarray(jnp.argmax(logits, axis=-1))

    # ------------------------------------------------------------------
    @property
    def variables(self) -> dict:
        return {"params": self.params, **self.extra}

    def _default_cfg(self):
        if self.model_type in ("mlp", "logreg", "softmaxregression"):
            return ("mfcc", config_dict(MFCC_CONFIG),
                    config_dict(MLP_CONFIG))
        return ("melspec", config_dict(MELSPEC_CONFIG),
                config_dict(CNN_CONFIG))

    def _ckpt_defaults(self):
        """Default checkpoint dir + filename per model family. Only the
        two reference families own the config-named paths; any other
        model type gets its own directory so e.g. a logreg baseline never
        overwrites the shipped CNN checkpoint."""
        if self.model_type == "mlp":
            return MLP_CONFIG.CHECKPOINTS_DIR, MLP_CONFIG.DEFAULT_CKPT_NAME
        if self.model_type == "cnn":
            return CNN_CONFIG.CHECKPOINTS_DIR, CNN_CONFIG.DEFAULT_CKPT_NAME
        from ..config import CHECKPOINTS_ROOT
        return (CHECKPOINTS_ROOT / self.model_type,
                f"{self.model_type}_v{CONFIG_VERSION}.gtckpt.npz")

    def save(self, filename=None, root=None, target_sr: int = TARGET_SR,
             clip_length: float = CLIP_DURATION, include_opt: bool = True):
        """Self-describing checkpoint, C15 schema (ref
        mlp_trainer.py:434-480)."""
        feat_type, feat_params, model_params = self._default_cfg()
        d_root, d_name = self._ckpt_defaults()
        root = Path(root) if root else d_root
        filename = filename or d_name
        ckpt = {
            "meta": {"config_version": CONFIG_VERSION,
                     "datetime": time.strftime("%d/%m/%Y %H:%M:%S"),
                     "model_type": self.model_type},
            "config": {
                "features": {"type": feat_type, "params": feat_params},
                "model": {"type": self.model_type, "params": model_params},
                "target_sr": target_sr,
                "clip_length": clip_length,
            },
            "variables": jax.tree_util.tree_map(np.asarray, self.variables),
            "model_init_args": dict(self.model.init_args),
            "train_loss_history": self.train_loss_history,
            "train_accuracy_history": self.train_accuracy_history,
            "val_loss_history": self.val_loss_history,
            "val_accuracy_history": self.val_accuracy_history,
            "epoch": self.epoch,
            "reverse_map": self.reverse_map,
            "num_classes": self.num_classes,
            "class_names": self.class_names,
        }
        if self.scaler is not None:
            if hasattr(self.scaler, "to_dict"):
                ckpt["scaler"] = self.scaler.to_dict()
            elif hasattr(self.scaler, "mean_"):
                # sklearn-style scaler: coerce to the checkpoint schema
                # NOW — writing the object itself would pickle it into
                # the npz, and load_checkpoint (allow_pickle=False)
                # could never read the file back; the save would
                # succeed and the failure surface at load time
                from ..utils.scaler import FeatureScaler
                ckpt["scaler"] = FeatureScaler.from_sklearn(
                    self.scaler).to_dict()
            else:
                raise TypeError(
                    "[save] scaler must be a FeatureScaler (or expose "
                    "sklearn's mean_/scale_): a foreign object would be "
                    f"pickled unreadably. Got {type(self.scaler)!r}.")
        if include_opt:
            ckpt["opt_state"] = _opt_state_to_tree(self.opt_state)
            ckpt["opt_state_fingerprint"] = _opt_state_fingerprint(
                self.opt_state)
            # plateau-scheduler state rides along: without it, the first
            # post-resume scheduler.step() would re-inject the
            # construction-time init LR, undoing the restored decay
            ckpt["scheduler"] = {"lr": self.scheduler.lr,
                                 "best": self.scheduler.best,
                                 "num_bad": self.scheduler.num_bad}
        return save_checkpoint(root / filename, ckpt)

    def load(self, filename=None, root=None):
        """Restore weights, histories, epoch counter (and optimizer state
        when present) — ref mlp_trainer.py:482-514."""
        d_root, d_name = self._ckpt_defaults()
        root = Path(root) if root else d_root
        filename = filename or d_name
        ck = load_checkpoint(Path(root) / filename)
        # validate BEFORE mutating any trainer state, so a caller that
        # catches the mismatch still holds a consistent Trainer
        if "opt_state" in ck:
            saved_fp = ck.get("opt_state_fingerprint")
            current_fp = _opt_state_fingerprint(self.opt_state)
            if saved_fp is not None and saved_fp != current_fp:
                raise ValueError(
                    "[load] optimizer state mismatch: the checkpoint's "
                    f"optimizer fingerprint {saved_fp!r} does not match the "
                    f"current optimizer's {current_fp!r}. Restoring it "
                    "positionally would silently mis-assign moments — "
                    "rebuild the Trainer with the optimizer the checkpoint "
                    "was saved with, or load with a fresh optimizer by "
                    "stripping 'opt_state' from the checkpoint.")
            if saved_fp is None:
                print("[load] WARNING: checkpoint has no optimizer "
                      "fingerprint (pre-fingerprint format); restoring "
                      "positionally against the current optimizer.")
        # restore the optimizer state BEFORE touching params/extra, so a
        # structural mismatch (legacy checkpoints have no fingerprint and
        # fail only at unflatten) cannot leave a half-loaded Trainer
        restored_opt = (_tree_to_opt_state(self.opt_state, ck["opt_state"])
                        if "opt_state" in ck else None)
        saved_args = ck.get("model_init_args", {})
        current = dict(self.model.init_args)
        # compare only keys the checkpoint recorded: init_args grows over
        # time (e.g. use_batchnorm was added after the v1.0.0 artifacts),
        # and a field absent from an old checkpoint means "the default",
        # which is exactly what reconstruction will use — not a mismatch
        norm_saved = {k: tuple(v) if isinstance(v, list) else v
                      for k, v in saved_args.items()}
        if saved_args and norm_saved != {k: current[k] for k in norm_saved
                                         if k in current}:
            print("[load] WARNING: Mismatch between saved model init args "
                  "and current model init args!")
            print("Saved:", saved_args)
            print("Current:", current)
        variables = jax.tree_util.tree_map(jnp.asarray, ck["variables"])
        self.params = variables.pop("params")
        self.extra = variables
        if restored_opt is not None:
            self.opt_state = restored_opt
        self.train_loss_history = list(ck.get("train_loss_history", []))
        self.train_accuracy_history = list(
            ck.get("train_accuracy_history", []))
        self.val_loss_history = list(ck.get("val_loss_history", []))
        self.val_accuracy_history = list(
            ck.get("val_accuracy_history", []))
        self.epoch = int(ck.get("epoch", 0))
        if restored_opt is not None:
            sch = ck.get("scheduler")
            if sch is not None:
                self.scheduler.lr = float(sch["lr"])
                self.scheduler.best = float(sch["best"])
                self.scheduler.num_bad = int(sch["num_bad"])
            else:
                # pre-scheduler-record checkpoint: at least keep the LR the
                # opt_state restored, so the first post-resume step doesn't
                # re-inject the construction-time init LR (plateau
                # best/patience restart — the decay itself survives)
                lr = _injected_lr(self.opt_state)
                if lr is not None:
                    self.scheduler.lr = lr
        print(f"[load] Checkpoint loaded from {Path(root) / filename}")


def _injected_lr(opt_state) -> float | None:
    """The injected learning_rate carried inside an optax state (bare
    inject_hyperparams state — itself a NamedTuple, so check it directly
    before iterating — or an element of a chain tuple), or None."""
    hp = getattr(opt_state, "hyperparams", None)
    if isinstance(hp, dict) and "learning_rate" in hp:
        return float(hp["learning_rate"])
    if isinstance(opt_state, tuple):
        for s in opt_state:
            hp = getattr(s, "hyperparams", None)
            if isinstance(hp, dict) and "learning_rate" in hp:
                return float(hp["learning_rate"])
    return None


def _opt_state_to_tree(opt_state) -> dict:
    """Flatten the optax state's array leaves into an indexed dict (the
    structure itself is re-derivable from the optimizer definition)."""
    leaves = jax.tree_util.tree_leaves(opt_state)
    return {f"leaf_{i:04d}": np.asarray(l) for i, l in enumerate(leaves)}


def _opt_state_fingerprint(opt_state) -> str:
    """Stable hash of the optimizer state's treedef + leaf shapes/dtypes.

    Positional leaf restore is only safe against the exact optimizer the
    state was saved from; the fingerprint lets `load` fail loudly when the
    chain (or the parameter shapes feeding it) changed."""
    import hashlib

    leaves, treedef = jax.tree_util.tree_flatten(opt_state)
    sig = str(treedef) + "|" + ";".join(
        f"{tuple(np.shape(l))}:{getattr(l, 'dtype', type(l).__name__)}"
        for l in leaves)
    return hashlib.sha256(sig.encode()).hexdigest()[:16]


def _tree_to_opt_state(template, tree: dict):
    leaves = [tree[k] for k in sorted(tree)]
    treedef = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(l) for l in leaves])
