import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from multimodal_similarity_tpu.configs import TrainConfig
from multimodal_similarity_tpu.data import generate_synthetic_honda
from multimodal_similarity_tpu.train import (
    CheckpointManager, TrainState, build_optimizer, l2_regularization,
    learning_rate_schedule, restore_subtree)
from multimodal_similarity_tpu.train.trainers import base_model


def test_lr_schedule():
    assert learning_rate_schedule(0, 0.1, 5, 10) == 0.1
    assert learning_rate_schedule(4, 0.1, 5, 10) == 0.1
    # epoch 5 of 10 with static 5: frac = 0 -> lr unchanged
    np.testing.assert_allclose(learning_rate_schedule(5, 0.1, 5, 10), 0.1)
    # final epoch: frac = 1 -> lr * 0.001
    np.testing.assert_allclose(learning_rate_schedule(10, 0.1, 5, 10), 1e-4)


def test_optimizer_lr_injection(rng):
    params = {"w": jnp.array(rng.randn(4, 4).astype(np.float32))}
    tx = build_optimizer("SGD", learning_rate=1.0)
    state = TrainState.create(params, tx)
    grads = {"w": jnp.ones((4, 4))}
    s1 = state.apply_gradients(grads, learning_rate=jnp.float32(0.5))
    np.testing.assert_allclose(np.asarray(s1.params["w"]),
                               np.asarray(params["w"]) - 0.5, rtol=1e-6)
    assert int(s1.step) == 1


def test_branch_gradient_scaling(rng):
    params = {
        "modality_core": {"w": jnp.ones((2,))},
        "modality_sensors": {"w": jnp.ones((2,))},
    }
    tx = build_optimizer("SGD", learning_rate=1.0)
    state = TrainState.create(params, tx)
    grads = jax.tree.map(jnp.ones_like, params)
    s1 = state.apply_gradients(grads, learning_rate=jnp.float32(1.0))
    # core gets full step, pretrained sensors branch 0.1x (utils.py:27-38)
    np.testing.assert_allclose(np.asarray(s1.params["modality_core"]["w"]),
                               0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1.params["modality_sensors"]["w"]),
                               0.9, rtol=1e-5)


def test_adam_epsilon_matches_reference(rng):
    # the reference uses AdamOptimizer(epsilon=0.1) (utils.py:17); confirm our
    # factory forwards it by comparing against optax.adam(eps=0.1) updates
    p = {"w": jnp.array(rng.randn(3).astype(np.float32))}
    g = {"w": jnp.array(rng.randn(3).astype(np.float32))}
    tx = build_optimizer("ADAM", learning_rate=0.01)
    st = TrainState.create(p, tx).apply_gradients(g)
    ref_tx = optax.adam(0.01, eps=0.1)
    ref_upd, _ = ref_tx.update(g, ref_tx.init(p), p)
    ref_w = np.asarray(optax.apply_updates(p, ref_upd)["w"])
    np.testing.assert_allclose(np.asarray(st.params["w"]), ref_w, rtol=1e-6)


def test_l2_regularization():
    params = {"layer": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,))}}
    # kernels only: 0.5 * 4 = 2.0
    np.testing.assert_allclose(float(l2_regularization(params)), 2.0)


def test_checkpoint_roundtrip_and_pruning(tmp_path, rng):
    params = {"a": jnp.array(rng.randn(3).astype(np.float32))}
    tx = build_optimizer("ADAM", 0.01)
    state = TrainState.create(params, tx)
    mgr = CheckpointManager(str(tmp_path), "m", max_to_keep=2)
    for step in (1, 2, 3):
        mgr.save(state.replace(step=jnp.int32(step)), step)
    assert mgr.all_steps() == [2, 3]
    restored = mgr.restore(state)
    assert int(restored.step) == 3
    np.testing.assert_allclose(np.asarray(restored.params["a"]),
                               np.asarray(params["a"]))


def test_checkpoint_save_async_matches_sync(tmp_path, rng):
    """save_async must produce byte-identical files to save, prune the
    same way, serialize writes (one in flight), stay donation-safe (the
    snapshot is host-resident before return), and surface writer errors
    at wait()."""
    import jax

    params = {"a": jnp.array(rng.randn(4).astype(np.float32))}
    tx = build_optimizer("ADAM", 0.01)
    state = TrainState.create(params, tx)

    sync_mgr = CheckpointManager(str(tmp_path / "sync"), "m", max_to_keep=2)
    async_mgr = CheckpointManager(str(tmp_path / "async"), "m",
                                  max_to_keep=2)
    for step in (1, 2, 3):
        st = state.replace(step=jnp.int32(step))
        sync_mgr.save(st, step)
        async_mgr.save_async(st, step)
    async_mgr.wait()
    assert async_mgr.all_steps() == sync_mgr.all_steps() == [2, 3]
    for step in (2, 3):
        a = open(tmp_path / "async" / f"m.ckpt-{step}", "rb").read()
        s = open(tmp_path / "sync" / f"m.ckpt-{step}", "rb").read()
        assert a == s

    # donation-safety: deleting the device state after save_async returns
    # must not corrupt the queued write (the snapshot is already on host)
    st = TrainState.create(
        {"a": jnp.array(np.asarray(params["a"]))}, tx).replace(
        step=jnp.int32(7))
    async_mgr.save_async(st, 7)
    for leaf in jax.tree_util.tree_leaves(st):
        if hasattr(leaf, "delete"):
            leaf.delete()
    target = TrainState.create({"a": jnp.zeros(4, jnp.float32)}, tx)
    restored = async_mgr.restore(target)  # restore() waits first
    assert int(restored.step) == 7
    np.testing.assert_allclose(np.asarray(restored.params["a"]),
                               np.asarray(params["a"]))

    # writer errors surface at wait(), not silently
    bad = CheckpointManager(str(tmp_path / "gone"), "m")
    import shutil
    shutil.rmtree(tmp_path / "gone")
    bad.save_async(state, 1)
    with pytest.raises(OSError):
        bad.wait()


def test_restore_subtree():
    big = {"modality_core": {"w": jnp.zeros(2)},
           "modality_sensors": {"w": jnp.zeros(2)}}
    ckpt = {"w": jnp.ones(2)}
    out = restore_subtree(big, ckpt, into_scope="modality_sensors")
    np.testing.assert_allclose(np.asarray(out["modality_sensors"]["w"]), 1.0)
    np.testing.assert_allclose(np.asarray(out["modality_core"]["w"]), 0.0)
    # eval-side: extract one branch of a multi-branch checkpoint
    bare = {"w": jnp.zeros(2)}
    out2 = restore_subtree(bare, out, from_scope="modality_sensors")
    np.testing.assert_allclose(np.asarray(out2["w"]), 1.0)


@pytest.fixture(scope="module")
def synth_cfg(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("honda_train"))
    generate_synthetic_honda(
        root, n_sessions=5, frames_per_session=300,
        modal_dims={"resnet": (2, 2, 8), "sensors": (8,)},
        class_scale=1.0, noise_scale=1.0, seed=0)
    return root


def _tiny_cfg(root, **kw):
    defaults = dict(
        DATA_ROOT=root, name="t", network="rtsn", feat="sensors",
        n_input=8, emb_dim=16, num_seg=3, sess_per_batch=2, max_epochs=2,
        triplet_per_batch=32, triplet_select="facenet", learning_rate=0.01,
        keep_prob=0.9, silent_mode=True, label_num=93)
    defaults.update(kw)
    return TrainConfig(**defaults).resolve()


def test_base_trainer_end_to_end(synth_cfg, tmp_path):
    cfg = _tiny_cfg(synth_cfg)
    state, metrics, result_dir = base_model.train(
        cfg, event_budget=64, result_dir=str(tmp_path / "run"))
    assert int(state.step) == 2 * 1  # 2 epochs x 1 batch (2 of 3 sessions)
    assert 0.0 <= metrics["val_mAP"] <= 1.0
    assert os.path.exists(os.path.join(str(tmp_path / "run"), "config.txt"))
    assert os.path.exists(os.path.join(str(tmp_path / "run"),
                                       "metrics.jsonl"))
    mgr = CheckpointManager(str(tmp_path / "run"), "t")
    assert mgr.latest_step() == int(state.step)


def test_base_trainer_profile_dir(synth_cfg, tmp_path):
    """--profile_dir captures a jax.profiler trace of steady-state steps
    (the profiling library previously had no trainer consumer)."""
    prof = str(tmp_path / "prof")
    cfg = _tiny_cfg(synth_cfg, profile_dir=prof, profile_steps=1)
    base_model.train(cfg, event_budget=64, result_dir=str(tmp_path / "p"))
    import glob
    traces = glob.glob(os.path.join(prof, "**", "*.trace.json*"),
                       recursive=True) + glob.glob(
        os.path.join(prof, "**", "*.xplane.pb"), recursive=True)
    assert traces, f"no trace artifacts under {prof}"


def test_base_trainer_random_mining(synth_cfg, tmp_path):
    cfg = _tiny_cfg(synth_cfg, triplet_select="random", max_epochs=1)
    state, metrics, _ = base_model.train(cfg, event_budget=64,
                                         result_dir=str(tmp_path / "r"))
    assert int(state.step) >= 1


def test_base_trainer_data_parallel(synth_cfg, tmp_path):
    """facenet path auto-shards over all visible devices (8 CPU here)."""
    cfg = _tiny_cfg(synth_cfg)
    state, metrics, _ = base_model.train(cfg, event_budget=64,
                                         result_dir=str(tmp_path / "dp"))
    assert int(state.step) == 2
    assert np.isfinite(metrics["val_mAP"])


@pytest.mark.slow
def test_base_trainer_resume_is_step_accurate(synth_cfg, tmp_path):
    """model_path restore continues from the saved global step
    (reference base_model.py:216-217 epoch derivation)."""
    import glob
    cfg = _tiny_cfg(synth_cfg, max_epochs=1)
    state1, _, rd = base_model.train(cfg, event_budget=64,
                                     result_dir=str(tmp_path / "a"))
    ckpt = sorted(glob.glob(str(tmp_path / "a" / "*.ckpt-*")))[-1]
    cfg2 = _tiny_cfg(synth_cfg, max_epochs=2, model_path=ckpt)
    state2, _, _ = base_model.train(cfg2, event_budget=64,
                                    result_dir=str(tmp_path / "b"))
    # resumed from step 1, ran exactly one more epoch (1 batch/epoch)
    assert int(state1.step) == 1
    assert int(state2.step) == 2


@pytest.mark.slow
def test_host_device_miner_metric_parity(tmp_path_factory, tmp_path):
    """SURVEY §7 acceptance: the device miner matches the reference host
    miner on retrieval metrics (not index traces). Train the same model
    with each and compare final val mAP on learnable synthetic data."""
    root = str(tmp_path_factory.mktemp("parity"))
    generate_synthetic_honda(
        root, n_sessions=6, frames_per_session=500,
        modal_dims={"sensors": (8,)}, class_scale=1.5, noise_scale=1.0,
        seed=4)
    results = {}
    for select in ("facenet", "facenet_host"):
        cfg = TrainConfig(
            DATA_ROOT=root, name=select, network="rtsn", feat="sensors",
            n_input=8, emb_dim=16, num_seg=3, sess_per_batch=2,
            max_epochs=8, triplet_per_batch=48, triplet_select=select,
            learning_rate=0.01, silent_mode=True).resolve()
        _, metrics, _ = base_model.train(
            cfg, event_budget=64, result_dir=str(tmp_path / select))
        results[select] = metrics["val_mAP"]
    # both miners must train to comparable retrieval quality
    assert results["facenet"] > 0.45, results
    assert results["facenet_host"] > 0.45, results
    assert abs(results["facenet"] - results["facenet_host"]) < 0.25, results


def test_triplet_step_bf16_features_close(rng):
    """The fused step accepts bfloat16 event features (halved HBM read /
    transfer); loss should track the f32 result closely."""
    from multimodal_similarity_tpu.models import build_encoder
    from multimodal_similarity_tpu.train.state import (TrainState,
                                                       build_optimizer)
    from multimodal_similarity_tpu.train.steps import make_triplet_train_step

    n = 32
    model = build_encoder("tsn", num_seg=3, emb_dim=8, n_input=6)
    x = jnp.asarray(rng.randn(n, 3, 6).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 3, size=n))
    mask = jnp.ones(n, jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x[:2])["params"]
    step = make_triplet_train_step(model, triplet_per_batch=12, alpha=0.2)
    key = jax.random.PRNGKey(1)

    # independent param copies: the step donates (and deletes) its input
    s32 = TrainState.create(jax.tree.map(jnp.copy, params),
                            build_optimizer("ADAM", 0.01))
    _, aux32 = step(s32, x, labels, mask, key, jnp.float32(0.01))
    s16 = TrainState.create(jax.tree.map(jnp.copy, params),
                            build_optimizer("ADAM", 0.01))
    _, aux16 = step(s16, x.astype(jnp.bfloat16), labels, mask, key,
                    jnp.float32(0.01))
    assert abs(float(aux32["loss"]) - float(aux16["loss"])) < 3e-2


def test_validate_caches_val_feats_on_device(rng):
    """validate() uploads the val features once and reuses the device copy
    across epochs (same host array object)."""
    from multimodal_similarity_tpu.models import build_encoder
    from multimodal_similarity_tpu.train import trainer as trainer_mod
    from multimodal_similarity_tpu.train.steps import make_embed_fn

    model = build_encoder("tsn", num_seg=3, emb_dim=8, n_input=6)
    val = rng.randn(20, 3, 6).astype(np.float32)
    labels = np.array([1, 2] * 10, np.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(val[:2]))["params"]
    embed_fn = make_embed_fn(model, True)

    trainer_mod._VAL_DEVICE_CACHE.clear()
    m1, _ = trainer_mod.validate(embed_fn, params, val, labels)
    _, dev1 = trainer_mod._VAL_DEVICE_CACHE[id(val)]
    m2, _ = trainer_mod.validate(embed_fn, params, val, labels)
    assert trainer_mod._VAL_DEVICE_CACHE[id(val)][1] is dev1  # reused
    assert m1["val_mAP"] == m2["val_mAP"]

    # a dead weakref must never serve stale data: simulate id reuse by
    # swapping in a different live array under the same key
    other = rng.randn(20, 3, 6).astype(np.float32)
    trainer_mod._VAL_DEVICE_CACHE[id(other)] = \
        trainer_mod._VAL_DEVICE_CACHE.pop(id(val))
    fresh = trainer_mod._val_feats_on_device(other)
    np.testing.assert_array_equal(np.asarray(fresh), other)

    val2 = rng.randn(24, 3, 6).astype(np.float32)
    trainer_mod.validate(embed_fn, params, val2,
                         np.array([1, 2] * 12, np.int32))
    assert id(val) not in trainer_mod._VAL_DEVICE_CACHE  # one-slot cache


def test_donated_step_matches_undonated(rng):
    """Buffer donation (jit_step, donate_argnums=0) must be a pure memory
    optimization: a donated step and an undonated jit of the SAME step body
    produce bitwise-identical new params from identical starting states."""
    from multimodal_similarity_tpu.models import build_encoder
    from multimodal_similarity_tpu.train.steps import make_triplet_train_step

    n, n_seg, d_in = 32, 3, 8
    x = jnp.asarray(rng.randn(n, n_seg, d_in).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 4, size=n).astype(np.int32))
    mask = jnp.ones(n, jnp.float32)
    model = build_encoder("rtsn", num_seg=n_seg, emb_dim=16, n_input=d_in)
    variables = model.init(jax.random.PRNGKey(0), x[:2])

    def fresh_state():
        return TrainState.create(
            jax.tree.map(jnp.copy, variables["params"]),
            build_optimizer("ADAM", 0.01))

    donated_step = make_triplet_train_step(model, triplet_per_batch=12)
    # the same traced computation, without donation
    undonated_step = jax.jit(donated_step.__wrapped__)

    key, lr = jax.random.PRNGKey(7), jnp.float32(0.01)
    s_don, aux_don = donated_step(fresh_state(), x, labels, mask, key, lr)
    s_ref, aux_ref = undonated_step(fresh_state(), x, labels, mask, key, lr)
    for a, b in zip(jax.tree.leaves(s_don.params),
                    jax.tree.leaves(s_ref.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(float(aux_don["loss"]),
                                  float(aux_ref["loss"]))


def test_donated_step_consumes_input_state(rng):
    """The donated input state must actually be consumed (donation active),
    otherwise the HBM saving silently evaporates."""
    from multimodal_similarity_tpu.models import build_encoder
    from multimodal_similarity_tpu.train.steps import make_triplet_train_step

    n, n_seg, d_in = 16, 3, 8
    x = jnp.asarray(rng.randn(n, n_seg, d_in).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 3, size=n).astype(np.int32))
    model = build_encoder("rtsn", num_seg=n_seg, emb_dim=8, n_input=d_in)
    state = TrainState.create(
        model.init(jax.random.PRNGKey(0), x[:2])["params"],
        build_optimizer("ADAM", 0.01))
    step = make_triplet_train_step(model, triplet_per_batch=6)
    old_leaf = jax.tree.leaves(state.params)[0]
    state, _ = step(state, x, labels, jnp.ones(n, jnp.float32),
                    jax.random.PRNGKey(1), jnp.float32(0.01))
    with pytest.raises(RuntimeError):
        _ = np.asarray(old_leaf) + 1  # donated buffer is deleted


def test_base_trainer_preemption_checkpoints_and_exits(
        synth_cfg, tmp_path, monkeypatch):
    """A preemption signal mid-epoch checkpoints the exact step and exits
    cleanly instead of losing the epoch (utils/preemption.py)."""
    from multimodal_similarity_tpu.utils import preemption as _pre

    class FiringGuard:
        def __init__(self, *a, **k):
            self.checks = 0

        def install(self):
            return self

        def restore(self):
            pass

        @property
        def should_stop(self):
            self.checks += 1
            return self.checks > 2   # fire after two post-step checks

    monkeypatch.setattr(_pre, "PreemptionGuard", FiringGuard)
    cfg = _tiny_cfg(synth_cfg, max_epochs=50)
    state, metrics, result_dir = base_model.train(
        cfg, event_budget=64, result_dir=str(tmp_path / "pre"))
    # stopped after ~2 steps, far short of 50 epochs' worth
    assert int(state.step) <= 3
    import glob
    ckpts = glob.glob(os.path.join(result_dir, "*.ckpt-*"))
    assert ckpts, "preemption exit did not write a checkpoint"


def test_l2_normalize_matches_tf_semantics():
    """tf.nn.l2_normalize floors the squared SUM at eps: degenerate
    near-zero vectors stay near zero instead of amplifying to unit norm."""
    from multimodal_similarity_tpu.train.steps import l2_normalize

    x = np.zeros((2, 4), np.float32)
    x[0] = 1e-8          # ss = 4e-16: between eps^2 and eps
    x[1, 0] = 3.0        # healthy row
    out = np.asarray(l2_normalize(jnp.asarray(x)))
    assert np.linalg.norm(out[0]) < 1e-2, "degenerate row blew up"
    np.testing.assert_allclose(np.linalg.norm(out[1]), 1.0, rtol=1e-6)
    try:
        import tensorflow as tf
    except ImportError:
        return
    # the reference passes epsilon=1e-10 at every call site
    # (base_model.py:136 etc.)
    ref = tf.nn.l2_normalize(tf.constant(x), axis=-1, epsilon=1e-10).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-12)


def test_rmsprop_tf1_initial_scale():
    """tf.train.RMSPropOptimizer starts its mean-square accumulator at
    ONES; the first update must use sqrt(decay*1 + (1-decay)*g^2 + eps)."""
    import optax
    from multimodal_similarity_tpu.train.state import build_optimizer

    g, lr, decay, eps, momentum = 2.0, 0.1, 0.9, 1.0, 0.9
    params = {"w": jnp.zeros((1,), jnp.float32)}
    tx = build_optimizer("RMSPROP", lr)
    st = tx.init(params)
    upd, _ = tx.update({"w": jnp.full((1,), g)}, st, params)
    expected = -lr * g / np.sqrt(decay * 1.0 + (1 - decay) * g * g + eps)
    np.testing.assert_allclose(np.asarray(upd["w"]), expected, rtol=1e-6)


def test_l2_regularization_exempts_lstm_cells(rng):
    """The reference regularizes only its hand-declared W_* matrices;
    LSTM cell variables never join REGULARIZATION_LOSSES."""
    from multimodal_similarity_tpu.models import build_encoder
    from multimodal_similarity_tpu.train.state import l2_regularization

    model = build_encoder("rtsn", num_seg=3, emb_dim=8, n_input=4)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, 3, 4)))["params"]
    total = float(l2_regularization(params))
    manual = 0.0
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    saw_cell = False
    for path, leaf in flat:
        keys = [str(getattr(p, "key", "")) for p in path]
        if "cell" in keys:
            saw_cell = True
            continue
        if keys[-1].startswith("b"):
            continue
        manual += 0.5 * float(np.sum(np.square(np.asarray(leaf))))
    assert saw_cell, "rtsn params should contain an LSTM cell subtree"
    np.testing.assert_allclose(total, manual, rtol=1e-6)


def test_embed_arrays_in_chunks_multi_input(rng):
    """Multi-chunk + remainder padding over row-aligned input tuples must
    equal the single forward (the eval CLIs' fusion path)."""
    from multimodal_similarity_tpu.train.steps import embed_arrays_in_chunks

    W = rng.randn(6, 3).astype(np.float32)
    X = rng.randn(11, 6).astype(np.float32)
    B = rng.randn(11, 3).astype(np.float32)
    f1 = jax.jit(lambda x: x @ W)
    got = embed_arrays_in_chunks(f1, (X,), chunk=4)   # 3 chunks, last padded
    np.testing.assert_allclose(got, X @ W, rtol=1e-6)
    f2 = jax.jit(lambda a, b: a @ W + b)
    got2 = embed_arrays_in_chunks(f2, (X, B), chunk=4)
    np.testing.assert_allclose(got2, X @ W + B, rtol=1e-6)
    # n < chunk: single padded call
    got3 = embed_arrays_in_chunks(f2, (X[:2], B[:2]), chunk=4)
    np.testing.assert_allclose(got3, X[:2] @ W + B[:2], rtol=1e-6)


def test_base_trainer_int8_features(synth_cfg, tmp_path):
    """--int8_features ships quantized features through the device feed;
    the step dequantizes inline and trains normally."""
    cfg = _tiny_cfg(synth_cfg, int8_features=True)
    state, metrics, _ = base_model.train(
        cfg, event_budget=64, result_dir=str(tmp_path / "i8"))
    assert int(state.step) == 2
    assert np.isfinite(metrics["val_mAP"])

    with pytest.raises(ValueError):
        base_model.train(_tiny_cfg(synth_cfg, int8_features=True,
                                   bf16_features=True),
                         event_budget=64,
                         result_dir=str(tmp_path / "bad"))
    with pytest.raises(ValueError):
        base_model.train(_tiny_cfg(synth_cfg, int8_features=True,
                                   triplet_select="facenet_host"),
                         event_budget=64,
                         result_dir=str(tmp_path / "bad2"))


@pytest.mark.slow
def test_int8_features_quality_parity(tmp_path_factory, tmp_path):
    """int8 feature quantization must not change what the model learns:
    same data/config/seed trained both ways lands at comparable val mAP
    (the quantization error is <0.4% of each scale group's range).

    Band: 0.15 ~= 1.7 sigma of a single-run A/B difference, from the
    recorded 3-seed x 3-mode chip study at the discriminative operating
    point (RESULTS.md "Feature-precision study"; per-seed sigma
    0.05-0.08, int8 mean within 0.001 of f32)."""
    root = str(tmp_path_factory.mktemp("honda_i8"))
    generate_synthetic_honda(
        root, n_sessions=5, frames_per_session=300,
        modal_dims={"resnet": (2, 2, 8), "sensors": (8,)},
        class_scale=1.0, noise_scale=1.8, seed=3)

    results = {}
    for mode in ("f32", "int8"):
        cfg = _tiny_cfg(root, max_epochs=10, learning_rate=0.02,
                        int8_features=(mode == "int8"))
        _, metrics, _ = base_model.train(
            cfg, event_budget=64, result_dir=str(tmp_path / mode))
        results[mode] = metrics["val_mAP"]
    assert results["int8"] >= results["f32"] - 0.15, results
