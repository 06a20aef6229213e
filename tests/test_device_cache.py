"""Device-resident int8 epoch feature cache (data/device_cache.py).

Pins the contract the trainers rely on: cached batches are BIT-IDENTICAL
to what the int8 streaming feed would upload for the same frame selection
(quantization commutes with frame selection because scales are per
(event, frame[, channel])), the epoch plan mirrors SessionBatchLoader
semantics, the mesh path gathers shard-locally, and an over-budget build
falls back to None.
"""

import numpy as np
import pytest

from multimodal_similarity_tpu.configs import TrainConfig
from multimodal_similarity_tpu.data import generate_synthetic_honda
from multimodal_similarity_tpu.data.datasets import (
    load_data_and_label, prepare_dataset, prepare_multimodal_dataset)
from multimodal_similarity_tpu.data.device_cache import (
    DeviceFeatureCache, _session_event_lengths, estimate_cache_bytes)
from multimodal_similarity_tpu.data.device_feed import quantize_features

N_SEG = 3
T_CAP = 45


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("honda_dc"))
    generate_synthetic_honda(
        root, n_sessions=9, frames_per_session=260,
        modal_dims={"resnet": (2, 2, 8), "sensors": (8,), "segment": (16,)},
        class_scale=1.0, noise_scale=1.0, seed=3,
        splits=(0.95, 0.04))
    return root


def _window_prepare(window):
    out = np.zeros((1, T_CAP) + window.shape[1:], np.float32)
    out[0, : min(window.shape[0], T_CAP)] = window[:T_CAP]
    return out


def _load_all_windows(dataset, modality_col):
    """[N, T, ...] windows + per-event seq_len, in cache packing order
    (dataset order, which is shard round-robin order for n_shards=1)."""
    wins, lens, labs = [], [], []
    for row in dataset:
        eve, lab, bounds = load_data_and_label(
            row[modality_col], row[-1], _window_prepare, True)
        wins.append(eve)
        labs.append(lab.reshape(-1))
        lens.extend(min(e - s, T_CAP) for s, e in bounds)
    return (np.concatenate(wins), np.asarray(lens, np.int32),
            np.concatenate(labs))


def _sample_offsets(key, lens, m):
    import jax

    from multimodal_similarity_tpu.data.tsn import tsn_sample_offsets
    return np.asarray(tsn_sample_offsets(
        jax.random.fold_in(key, m), np.asarray(lens), N_SEG))


def test_cache_bit_identical_to_streamed_int8(synth_root):
    """The gathered batch must equal quantize_features applied to the SAME
    host-sliced frames — i.e. exactly the bytes the int8 streaming feed
    (device_feed.make_batch_placer int8_keys) would have uploaded."""
    cfg = TrainConfig(DATA_ROOT=synth_root, feat="sensors").resolve()
    dataset = prepare_dataset(cfg.feature_root, cfg.train_session,
                              "sensors", cfg.label_root, "goal")
    cache = DeviceFeatureCache.build(
        dataset, n_seg=N_SEG, sess_per_batch=2, event_budget=24, seed=7)
    assert cache is not None
    windows, lens, labs = _load_all_windows(dataset, 0)
    assert cache.shard_rows == windows.shape[0]

    batches = list(cache.epoch_batches())
    assert len(batches) == cache.batches_per_epoch > 0
    for batch in batches:
        idx = batch["global_indices"]
        offs = _sample_offsets(batch["tsn_key"], lens[idx], m=0)  # [B, S]
        frames = windows[idx[:, None], offs]                     # [B, S, D]
        q_exp, s_exp = quantize_features(frames)
        np.testing.assert_array_equal(
            np.asarray(batch["events"]["q"]), q_exp)
        np.testing.assert_array_equal(
            np.asarray(batch["events"]["scale"]), s_exp)
        # labels ride the plan, aligned with the gathered rows
        np.testing.assert_array_equal(np.asarray(batch["labels"]),
                                      labs[idx] * (batch["mask"] > 0))


def test_cache_plan_mirrors_loader_semantics(synth_root):
    cfg = TrainConfig(DATA_ROOT=synth_root, feat="sensors").resolve()
    dataset = prepare_dataset(cfg.feature_root, cfg.train_session,
                              "sensors", cfg.label_root, "goal")
    budget = 16
    cache = DeviceFeatureCache.build(
        dataset, n_seg=N_SEG, sess_per_batch=3, event_budget=budget, seed=1)
    assert cache.batches_per_epoch == len(dataset) // 3
    seen = []
    for batch in cache.epoch_batches():
        mask = np.asarray(batch["mask"])
        assert mask.shape == (budget,)
        n = int(mask.sum())
        assert batch["num_events"] == n
        # real rows first per shard block; over-budget groups subsample
        assert np.all(mask[:n] == 1.0) and np.all(mask[n:] == 0.0)
        idx = batch["global_indices"][:n]
        assert len(set(idx.tolist())) == n  # no duplicate real events
        seen.extend(idx.tolist())
    # a second epoch draws a different plan (rng advances)
    second = [b["global_indices"][: int(np.asarray(b["mask"]).sum())]
              for b in cache.epoch_batches()]
    assert any(not np.array_equal(a, b)
               for a, b in zip(np.array_split(np.asarray(seen), len(second)),
                               second))


def test_cache_multimodal_modalities_draw_independent_offsets(synth_root):
    cfg = TrainConfig(DATA_ROOT=synth_root,
                      feat=["sensors", "segment"]).resolve()
    dataset = prepare_multimodal_dataset(
        cfg.feature_root, cfg.train_session, ["sensors", "segment"],
        cfg.label_root, "goal")
    cache = DeviceFeatureCache.build(
        dataset, n_seg=N_SEG, sess_per_batch=2, event_budget=16, seed=2)
    win0, lens, _ = _load_all_windows(dataset, 0)
    win1, _, _ = _load_all_windows(dataset, 1)
    batch = next(cache.epoch_batches())
    idx = batch["global_indices"]
    for m, (wins, key_name) in enumerate(
            [(win0, "events"), (win1, "events2")]):
        offs = _sample_offsets(batch["tsn_key"], lens[idx], m=m)
        q_exp, s_exp = quantize_features(wins[idx[:, None], offs])
        np.testing.assert_array_equal(
            np.asarray(batch[key_name]["q"]), q_exp)
        np.testing.assert_array_equal(
            np.asarray(batch[key_name]["scale"]), s_exp)


def test_cache_mesh_shard_local_gather(synth_root):
    """8-shard mesh: sessions round-robin over shards, every batch row
    block gathers only shard-resident events, bits equal to the host
    reconstruction under the same fold chain."""
    import jax

    from multimodal_similarity_tpu.parallel import create_mesh
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = create_mesh(8)
    cfg = TrainConfig(DATA_ROOT=synth_root, feat="sensors").resolve()
    dataset = prepare_dataset(cfg.feature_root, cfg.train_session,
                              "sensors", cfg.label_root, "goal")
    assert len(dataset) >= 8
    cache = DeviceFeatureCache.build(
        dataset, n_seg=N_SEG, sess_per_batch=1, event_budget=32, seed=5,
        mesh=mesh)
    assert cache is not None and cache.n_shards == 8

    # reconstruct per-shard window tables in shard packing order
    per_shard_rows = [[] for _ in range(8)]
    for i, row in enumerate(dataset):
        per_shard_rows[i % 8].append(row)
    shard_windows, shard_lens = [], []
    for rows in per_shard_rows:
        w, l, _ = _load_all_windows(rows, 0)
        shard_windows.append(w)
        shard_lens.append(l)

    batch = next(cache.epoch_batches())
    per = 32 // 8
    ev = np.asarray(batch["events"]["q"])
    sc = np.asarray(batch["events"]["scale"])
    for s in range(8):
        rows = slice(s * per, (s + 1) * per)
        gidx = batch["global_indices"][rows]
        local = gidx % cache.shard_rows
        assert np.all(gidx // cache.shard_rows == s)  # shard-local plan
        lens = shard_lens[s][local]
        k = jax.random.fold_in(batch["tsn_key"], s)
        offs = _sample_offsets(k, lens, m=0)
        frames = shard_windows[s][local[:, None], offs]
        q_exp, s_exp = quantize_features(frames)
        np.testing.assert_array_equal(ev[rows], q_exp)
        np.testing.assert_array_equal(sc[rows], s_exp)


def test_cache_budget_fallback(synth_root):
    cfg = TrainConfig(DATA_ROOT=synth_root, feat="sensors").resolve()
    dataset = prepare_dataset(cfg.feature_root, cfg.train_session,
                              "sensors", cfg.label_root, "goal")
    est = estimate_cache_bytes(dataset)
    assert est > 0
    assert DeviceFeatureCache.build(
        dataset, n_seg=N_SEG, sess_per_batch=2, event_budget=16, seed=0,
        budget_bytes=est // 2, verbose=False) is None
    # estimate counts every modality
    mm = prepare_multimodal_dataset(
        cfg.feature_root, cfg.train_session, ["sensors", "segment"],
        cfg.label_root, "goal")
    assert estimate_cache_bytes(mm) > est
    # sharded estimate counts build()'s padding: every shard pads to the
    # largest shard's row count, so per-shard imbalance grows the bytes
    # the budget is checked against (never less than the unsharded sum)
    est4 = estimate_cache_bytes(dataset, n_shards=4)
    assert est4 >= est
    counts = [len(_session_event_lengths(row[-1])) for row in dataset]
    shard_events = [0, 0, 0, 0]
    for i, c in enumerate(counts):
        shard_events[i % 4] += c
    assert est4 == est * (max(shard_events) * 4) / sum(counts)


@pytest.mark.slow
def test_base_model_trainer_with_device_cache(synth_root, tmp_path):
    """--device_cache end-to-end: base_model trains over the cached feed
    (8 virtual devices -> dp mesh + shard-local gather) and reaches a
    finite validated state; epoch 2 reuses the resident cache."""
    from multimodal_similarity_tpu.train.trainers import base_model
    cfg = TrainConfig(
        DATA_ROOT=synth_root, name="dc", network="rtsn", feat="sensors",
        n_input=8, emb_dim=16, num_seg=N_SEG, sess_per_batch=2,
        max_epochs=2, triplet_per_batch=16, learning_rate=0.01,
        keep_prob=0.9, silent_mode=True, triplet_select="facenet",
        device_cache=True).resolve()
    state, metrics, _ = base_model.train(
        cfg, event_budget=32, result_dir=str(tmp_path / "dc"))
    assert int(state.step) >= 2
    assert np.isfinite(metrics["val_mAP"])


@pytest.mark.slow
def test_base_model_device_cache_budget_fallback(synth_root, tmp_path):
    """An over-budget cache falls back to the streaming feed and still
    trains (the cache is an optimization, never a correctness gate)."""
    from multimodal_similarity_tpu.train.trainers import base_model
    cfg = TrainConfig(
        DATA_ROOT=synth_root, name="dcf", network="rtsn", feat="sensors",
        n_input=8, emb_dim=16, num_seg=N_SEG, sess_per_batch=2,
        max_epochs=1, triplet_per_batch=16, learning_rate=0.01,
        keep_prob=0.9, silent_mode=True, triplet_select="facenet",
        device_cache=True, device_cache_gb=1e-9).resolve()
    state, metrics, _ = base_model.train(
        cfg, event_budget=32, result_dir=str(tmp_path / "dcf"))
    assert int(state.step) >= 1
    assert np.isfinite(metrics["val_mAP"])


@pytest.mark.slow
def test_flagship_fused_with_device_cache(synth_root, tmp_path):
    """--device_cache on the flagship --device_mining path: all three
    modalities gathered from the resident int8 cache into the fused step
    (labeled mining + PDDM pseudo-sim + hard/structure mining)."""
    from multimodal_similarity_tpu.train.trainers import multimodal_model
    cfg = TrainConfig(
        DATA_ROOT=synth_root, name="mmdc", network="convrtsn",
        feat=["resnet", "sensors", "segment"], n_input=8, n_h=2, n_w=2,
        n_C=4, emb_dim=16, num_seg=N_SEG, sess_per_batch=2, max_epochs=2,
        triplet_per_batch=12, learning_rate=0.01, keep_prob=0.9,
        lambda_multimodal=0.5, multimodal_epochs=0, label_num=4,
        silent_mode=True, device_cache=True).resolve()
    cfg.feat_dim["segment"] = (16,)
    state, metrics, _ = multimodal_model.train(
        cfg, device_mining=True, event_budget=32,
        result_dir=str(tmp_path / "mmdc"))
    assert int(state.step) >= 2
    assert np.isfinite(metrics["val_mAP"])


@pytest.mark.slow
def test_batchhard_with_device_cache(synth_root, tmp_path):
    """--device_cache on batch-hard: balanced selection runs on the plan's
    host labels; the [B] slice is a device-side take from the cache."""
    from multimodal_similarity_tpu.train.trainers import base_model_batchhard
    cfg = TrainConfig(
        DATA_ROOT=synth_root, name="bhdc", network="rtsn", feat="sensors",
        n_input=8, emb_dim=16, num_seg=N_SEG, sess_per_batch=2,
        max_epochs=2, batch_size=32, learning_rate=0.01, keep_prob=0.9,
        silent_mode=True, device_cache=True).resolve()
    state, metrics, _ = base_model_batchhard.train(
        cfg, event_budget=32, result_dir=str(tmp_path / "bhdc"))
    assert int(state.step) >= 2
    assert np.isfinite(metrics["val_mAP"])


@pytest.mark.slow
def test_device_cache_composes_with_model_parallel(synth_root, tmp_path):
    """--device_cache + --model_parallel 2: cache rows shard over the
    4-wide data axis of the dp x tp mesh, weights column-shard over
    "model", and the trainer runs end-to-end."""
    import jax

    from multimodal_similarity_tpu.train.trainers import base_model
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = TrainConfig(
        DATA_ROOT=synth_root, name="dctp", network="rtsn", feat="sensors",
        n_input=8, emb_dim=32, num_seg=N_SEG, sess_per_batch=2,
        max_epochs=1, triplet_per_batch=16, learning_rate=0.01,
        keep_prob=0.9, silent_mode=True, triplet_select="facenet",
        device_cache=True, model_parallel=2).resolve()
    state, metrics, _ = base_model.train(
        cfg, event_budget=32, result_dir=str(tmp_path / "dctp"))
    assert int(state.step) >= 1
    assert np.isfinite(metrics["val_mAP"])
    specs = {ax for p in jax.tree_util.tree_leaves(state.params)
             if hasattr(p, "sharding")
             for part in p.sharding.spec if part
             for ax in (part if isinstance(part, tuple) else (part,))}
    assert "model" in specs


@pytest.mark.slow
def test_lifted_trainer_with_device_cache(synth_root, tmp_path):
    """base_model_lifted delegates to the batch-hard loop, so
    --device_cache carries over; pin that it actually trains."""
    from multimodal_similarity_tpu.train.trainers import base_model_lifted
    cfg = TrainConfig(
        DATA_ROOT=synth_root, name="lidc", network="rtsn", feat="sensors",
        n_input=8, emb_dim=16, num_seg=N_SEG, sess_per_batch=2,
        max_epochs=1, batch_size=32, learning_rate=0.01, keep_prob=0.9,
        silent_mode=True, device_cache=True).resolve()
    state, metrics, _ = base_model_lifted.train(
        cfg, event_budget=32, result_dir=str(tmp_path / "lidc"))
    assert int(state.step) >= 1
    assert np.isfinite(metrics["val_mAP"])


@pytest.mark.slow
def test_fused_cached_step_matches_two_call_path(synth_root, tmp_path):
    """The single-dispatch fused gather+train step must match the
    two-call path (cache._gather -> plain fused step) bit-for-bit under
    the same key: same frames, same mining draw, same loss."""
    import jax
    import jax.numpy as jnp

    from multimodal_similarity_tpu.models import build_encoder
    from multimodal_similarity_tpu.train.cached_steps import (
        make_cached_triplet_step)
    from multimodal_similarity_tpu.train.state import (
        TrainState, build_optimizer)
    from multimodal_similarity_tpu.train.steps import (
        make_triplet_train_step)

    cfg = TrainConfig(DATA_ROOT=synth_root, feat="sensors").resolve()
    dataset = prepare_dataset(cfg.feature_root, cfg.train_session,
                              "sensors", cfg.label_root, "goal")
    cache = DeviceFeatureCache.build(
        dataset, n_seg=N_SEG, sess_per_batch=2, event_budget=24, seed=9)
    model = build_encoder("rtsn", num_seg=N_SEG, emb_dim=16, n_input=8,
                          keep_prob=0.9)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, N_SEG, 8)))["params"]

    def fresh_state():
        import numpy as _np
        p = jax.tree.map(lambda a: _np.array(a), params)
        return TrainState.create(p, build_optimizer("ADAM", 0.01))

    fused = make_cached_triplet_step(model, cache, triplet_per_batch=8,
                                     alpha=0.2)
    plan = next(cache.epoch_plans())
    key = jax.random.PRNGKey(77)
    s1, aux1 = fused(fresh_state(), plan["packed"], key, jnp.float32(0.01),
                     *cache.step_operands())

    # oracle: the tested two-call path under the split the fused step uses
    k_gather, k_rest = jax.random.split(key)
    gathered, labels, mask = cache._gather(
        k_gather, jnp.asarray(plan["packed"][0]), *cache.step_operands())
    plain = make_triplet_train_step(model, triplet_per_batch=8, alpha=0.2)
    s2, aux2 = plain(fresh_state(), gathered[0], labels, mask, k_rest,
                     jnp.float32(0.01))

    assert float(aux1["loss"]) == float(aux2["loss"])
    assert float(aux1["triplet_num"]) == float(aux2["triplet_num"])
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_flagship_cached_fused_step_matches_two_call_path(synth_root):
    """The flagship single-dispatch gather+mine+train step (make_mm_fused_step
    with cache=) must match the two-call path (cache._gather -> plain fused
    step) bit-for-bit under the same key: same frames for all three
    modalities, same mining draws, same three-loss update."""
    import jax
    import jax.numpy as jnp

    from multimodal_similarity_tpu.train.state import (
        TrainState, build_optimizer)
    from multimodal_similarity_tpu.train.trainers.multimodal_model import (
        build_models, make_mm_fused_step)

    cfg = TrainConfig(
        DATA_ROOT=synth_root, name="mmpar", network="convrtsn",
        feat=["resnet", "sensors", "segment"], n_input=8, n_h=2, n_w=2,
        n_C=4, emb_dim=16, num_seg=N_SEG, sess_per_batch=2,
        triplet_per_batch=12, keep_prob=0.9, lambda_multimodal=0.5,
        label_num=4, silent_mode=True).resolve()
    dataset = prepare_multimodal_dataset(
        cfg.feature_root, cfg.train_session,
        ["resnet", "sensors", "segment"], cfg.label_root, "goal")
    cache = DeviceFeatureCache.build(
        dataset, n_seg=N_SEG, sess_per_batch=2, event_budget=24, seed=11)
    assert cache is not None and cache.num_modalities == 3

    core, s_enc, s_pddm, g_enc, g_pddm = build_models(
        cfg, sensors_dim=8, segment_dim=16)
    e32 = jnp.zeros((2, 32), jnp.float32)
    params = {
        "modality_core": core.init(
            jax.random.PRNGKey(0),
            jnp.zeros((2, N_SEG, 2, 2, 8)))["params"],
        "modality_sensors": {
            "encoder": s_enc.init(jax.random.PRNGKey(1),
                                  jnp.zeros((2, N_SEG, 8)))["params"],
            "pddm": s_pddm.init(jax.random.PRNGKey(2), e32, e32,
                                method="score")["params"]},
        "modality_segment": {
            "encoder": g_enc.init(jax.random.PRNGKey(3),
                                  jnp.zeros((2, N_SEG, 16)))["params"],
            "pddm": g_pddm.init(jax.random.PRNGKey(4), e32, e32,
                                method="score")["params"]},
    }

    def fresh_state():
        p = jax.tree.map(lambda a: np.array(a), params)
        return TrainState.create(p, build_optimizer("ADAM", 0.01))

    cm = jnp.zeros(8, jnp.float32)
    use_mm = jnp.float32(1.0)
    plan = next(cache.epoch_plans())
    key = jax.random.PRNGKey(33)

    fused = make_mm_fused_step(core, s_enc, s_pddm, g_enc, g_pddm, cfg,
                               cache=cache)
    s1, aux1 = fused(fresh_state(), plan["packed"], cm, use_mm, key,
                     jnp.float32(0.01), *cache.step_operands())

    # oracle: the tested two-call path under the split the fused step uses
    k_gather, k_rest = jax.random.split(key)
    gathered, labels, mask = cache._gather(
        k_gather, jnp.asarray(plan["packed"][0]), *cache.step_operands())
    plain = make_mm_fused_step(core, s_enc, s_pddm, g_enc, g_pddm, cfg)
    s2, aux2 = plain(fresh_state(), gathered[0], gathered[1], gathered[2],
                     labels, mask, cm, use_mm, k_rest, jnp.float32(0.01))

    assert float(aux1["loss"]) == float(aux2["loss"])
    for k in ("triplet_count", "hard_count", "struct_count"):
        assert float(aux1[k]) == float(aux2[k]), k
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_batchhard_cached_fused_step_matches_two_call_path(synth_root):
    """The batch-hard single-dispatch gather+take+train step must match
    the two-call path (cache._gather -> host row take -> plain balanced
    step) bit-for-bit under the same key."""
    import jax
    import jax.numpy as jnp

    from multimodal_similarity_tpu.models import build_encoder
    from multimodal_similarity_tpu.ops.mining import select_batch_balanced
    from multimodal_similarity_tpu.train.state import (
        TrainState, build_optimizer)
    from multimodal_similarity_tpu.train.steps import take_features
    from multimodal_similarity_tpu.train.trainers.base_model_batchhard import (
        make_balanced_batch_step)

    cfg = TrainConfig(DATA_ROOT=synth_root, feat="sensors",
                      network="rtsn", n_input=8, emb_dim=16, num_seg=N_SEG,
                      keep_prob=0.9, silent_mode=True).resolve()
    dataset = prepare_dataset(cfg.feature_root, cfg.train_session,
                              "sensors", cfg.label_root, "goal")
    cache = DeviceFeatureCache.build(
        dataset, n_seg=N_SEG, sess_per_batch=2, event_budget=24, seed=21)
    model = build_encoder("rtsn", num_seg=N_SEG, emb_dim=16, n_input=8,
                          keep_prob=0.9)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, N_SEG, 8)))["params"]

    def fresh_state():
        p = jax.tree.map(lambda a: np.array(a), params)
        return TrainState.create(p, build_optimizer("ADAM", 0.01))

    import random as _random
    plan = next(cache.epoch_plans())
    valid = np.where(plan["mask_host"] > 0)[0]
    idx = select_batch_balanced(plan["labels_host"][valid], 16,
                                rng=_random.Random(5))
    rows = valid[idx].astype(np.int32)
    labels = jnp.asarray(plan["labels_host"][rows])
    key = jax.random.PRNGKey(99)

    fused = make_balanced_batch_step(model, cfg, "batchhard", cache=cache)
    s1, aux1 = fused(fresh_state(), plan["packed"], jnp.asarray(rows),
                     labels, key, jnp.float32(0.01), *cache.step_operands())

    # oracle: the tested two-call path under the split the fused step uses
    k_gather, k_drop = jax.random.split(key)
    gathered, _, _ = cache._gather(
        k_gather, jnp.asarray(plan["packed"][0]), *cache.step_operands())
    events = take_features(gathered[0], jnp.asarray(rows))
    plain = make_balanced_batch_step(model, cfg, "batchhard")
    s2, aux2 = plain(fresh_state(), events, labels, k_drop,
                     jnp.float32(0.01))

    assert float(aux1["loss"]) == float(aux2["loss"])
    assert float(aux1["active_count"]) == float(aux2["active_count"])
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_multistep_dispatch_matches_sequential_fused_steps(synth_root):
    """--steps_per_dispatch: lax.scan-ing K fused gather+take+train steps
    into one program must be bit-identical to K sequential calls of the
    K=1 fused step under the same key sequence."""
    import jax
    import jax.numpy as jnp

    from multimodal_similarity_tpu.models import build_encoder
    from multimodal_similarity_tpu.ops.mining import select_batch_balanced
    from multimodal_similarity_tpu.train.state import (
        TrainState, build_optimizer)
    from multimodal_similarity_tpu.train.trainers.base_model_batchhard import (
        make_balanced_batch_step)

    cfg = TrainConfig(DATA_ROOT=synth_root, feat="sensors",
                      network="rtsn", n_input=8, emb_dim=16, num_seg=N_SEG,
                      keep_prob=0.9, silent_mode=True,
                      device_cache=True, steps_per_dispatch=3).resolve()
    dataset = prepare_dataset(cfg.feature_root, cfg.train_session,
                              "sensors", cfg.label_root, "goal")
    cache = DeviceFeatureCache.build(
        dataset, n_seg=N_SEG, sess_per_batch=2, event_budget=24, seed=21)
    model = build_encoder("rtsn", num_seg=N_SEG, emb_dim=16, n_input=8,
                          keep_prob=0.9)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, N_SEG, 8)))["params"]

    def fresh_state():
        p = jax.tree.map(lambda a: np.array(a), params)
        return TrainState.create(p, build_optimizer("ADAM", 0.01))

    import random as _random
    K = 3
    sel_rng = _random.Random(5)
    wins = []
    plans = cache.epoch_plans()
    while len(wins) < K:
        plan = next(plans)
        valid = np.where(plan["mask_host"] > 0)[0]
        idx = select_batch_balanced(plan["labels_host"][valid], 16,
                                    rng=sel_rng)
        if idx.size == 0:
            continue
        rows = valid[idx].astype(np.int32)
        wins.append((plan["packed"], rows, plan["labels_host"][rows]))
    keys = [jax.random.PRNGKey(100 + i) for i in range(K)]
    ops = cache.step_operands()

    single = make_balanced_batch_step(model, cfg, "batchhard", cache=cache)
    s_seq = fresh_state()
    seq_loss = []
    for (packed, rows, labels), key in zip(wins, keys):
        s_seq, aux = single(s_seq, packed, jnp.asarray(rows),
                            jnp.asarray(labels), key, jnp.float32(0.01),
                            *ops)
        seq_loss.append(float(aux["loss"]))

    multi = make_balanced_batch_step(model, cfg, "batchhard", cache=cache,
                                     steps_per_dispatch=K)
    s_multi, auxs = multi(
        fresh_state(),
        np.stack([w[0] for w in wins]),
        np.stack([w[1] for w in wins]),
        np.stack([w[2] for w in wins]),
        jnp.stack(keys), jnp.float32(0.01), *ops)

    np.testing.assert_allclose(np.asarray(auxs["loss"]), seq_loss,
                               rtol=1e-6, atol=0)
    for a, b in zip(jax.tree_util.tree_leaves(s_multi.params),
                    jax.tree_util.tree_leaves(s_seq.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_batchhard_trainer_with_steps_per_dispatch(synth_root, tmp_path):
    """End-to-end --device_cache --steps_per_dispatch 2: full windows
    ride the scanned program, the epoch tail rides the K=1 step, and
    every optimizer step still lands in metrics.jsonl in order."""
    import json

    from multimodal_similarity_tpu.train.trainers import base_model_batchhard

    cfg = TrainConfig(DATA_ROOT=synth_root, feat="sensors", network="rtsn",
                      n_input=8, emb_dim=16, num_seg=N_SEG, batch_size=16,
                      max_epochs=2, static_epochs=1, device_cache=True,
                      steps_per_dispatch=2, silent_mode=True).resolve()
    state, metrics, rd = base_model_batchhard.train(
        cfg, event_budget=24, result_dir=str(tmp_path / "spd"))
    assert int(state.step) >= 2
    assert np.isfinite(metrics["val_mAP"])
    recs = [json.loads(l) for l in open(rd + "/metrics.jsonl")]
    train_steps = [r["step"] for r in recs if "loss" in r]
    assert train_steps == list(range(1, int(state.step) + 1))


def test_base_model_trainer_with_steps_per_dispatch(synth_root, tmp_path):
    """base_model (facenet) --device_cache --steps_per_dispatch 2: the
    windowed scan path and the K=1 tail both train; every step logged."""
    import json

    from multimodal_similarity_tpu.train.trainers import base_model

    cfg = TrainConfig(DATA_ROOT=synth_root, feat="sensors", network="rtsn",
                      n_input=8, emb_dim=16, num_seg=N_SEG,
                      triplet_select="facenet", triplet_per_batch=8,
                      max_epochs=2, static_epochs=1, device_cache=True,
                      steps_per_dispatch=2, silent_mode=True).resolve()
    state, metrics, rd = base_model.train(
        cfg, event_budget=24, result_dir=str(tmp_path / "bm_spd"))
    assert int(state.step) >= 2
    assert np.isfinite(metrics["val_mAP"])
    recs = [json.loads(l) for l in open(rd + "/metrics.jsonl")]
    train_steps = [r["step"] for r in recs if "loss" in r]
    assert train_steps == list(range(1, int(state.step) + 1))


def test_watchdog_fires_inside_k_window(synth_root, tmp_path):
    """A stall inside a --steps_per_dispatch K>1 scanned window fires the
    watchdog (VERDICT r4 weak #5): the window is ONE dispatch covering K
    optimizer steps, so the 10 ms deadline expires while the first
    window's compile+execution is still in flight; the guard stop lands
    at the window boundary and the run checkpoints the exact step instead
    of hanging.  Detection latency is bounded by --watchdog_secs itself —
    K does not multiply it (docs/WORKFLOW.md 'Sizing --watchdog_secs')."""
    import glob

    from multimodal_similarity_tpu.train.trainers import base_model

    import jax
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    # 4 x 2 dp x tp mesh -> 4 data shards -> 2 sessions/shard -> 2
    # batches/epoch: the K=2 scanned window really engages (8 plain dp
    # shards would leave 1 batch/epoch and every window a K=1 remainder)
    cfg = TrainConfig(DATA_ROOT=synth_root, name="wdk", feat="sensors",
                      network="rtsn", n_input=8, emb_dim=32, num_seg=N_SEG,
                      sess_per_batch=1, triplet_select="facenet",
                      triplet_per_batch=8, max_epochs=50, static_epochs=1,
                      device_cache=True, steps_per_dispatch=2,
                      model_parallel=2,
                      watchdog_secs=0.01, silent_mode=True).resolve()
    rd = str(tmp_path / "wdk")
    state, metrics, _ = base_model.train(cfg, event_budget=32,
                                         result_dir=rd)
    # stopped at the first window boundary, far short of 50 epochs
    # (batches_per_epoch >= 2 with sess_per_batch=1 on this fixture)
    assert int(state.step) <= 2 * cfg.steps_per_dispatch
    ckpts = glob.glob(rd + "/wdk.ckpt-*")
    assert ckpts, "preemption epilogue must checkpoint the exact step"


def test_watchdog_survives_k_window_drain(synth_root, tmp_path):
    """The complement: a deadline sized per docs/WORKFLOW.md (above the
    first window's compile + the K-step flush drain) rides out whole
    scanned windows without firing — the run completes every epoch."""
    from multimodal_similarity_tpu.train.trainers import base_model

    import jax
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = TrainConfig(DATA_ROOT=synth_root, name="wdok", feat="sensors",
                      network="rtsn", n_input=8, emb_dim=32, num_seg=N_SEG,
                      sess_per_batch=1, triplet_select="facenet",
                      triplet_per_batch=8, max_epochs=2, static_epochs=1,
                      device_cache=True, steps_per_dispatch=2,
                      model_parallel=2,
                      watchdog_secs=120.0, silent_mode=True).resolve()
    state, metrics, rd = base_model.train(
        cfg, event_budget=32, result_dir=str(tmp_path / "wdok"))
    # full run, no watchdog stop: 2 epochs x (2 batches/epoch = one full
    # K=2 scanned window each) = 4 optimizer steps
    assert int(state.step) == 4
    assert np.isfinite(metrics["val_mAP"])
    import json
    recs = [json.loads(l) for l in open(rd + "/metrics.jsonl")]
    train_steps = [r["step"] for r in recs if "loss" in r]
    assert train_steps == list(range(1, int(state.step) + 1))


@pytest.mark.slow
def test_cache_multistep_and_model_parallel_compose(synth_root, tmp_path):
    """The full TPU-first stack in one run: --device_cache (shard-local
    rows over the 4-wide data axis) + --steps_per_dispatch 2 (scanned
    K-step windows — sess_per_batch=1 gives 2 batches/epoch so a full
    window actually dispatches) + --model_parallel 2 (column-sharded
    params on the dp x tp mesh)."""
    import jax

    from multimodal_similarity_tpu.train.trainers import base_model
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = TrainConfig(
        DATA_ROOT=synth_root, name="dctpms", network="rtsn",
        feat="sensors", n_input=8, emb_dim=32, num_seg=N_SEG,
        sess_per_batch=1, max_epochs=2, triplet_per_batch=16,
        learning_rate=0.01, keep_prob=0.9, silent_mode=True,
        triplet_select="facenet", device_cache=True, model_parallel=2,
        steps_per_dispatch=2).resolve()
    state, metrics, _ = base_model.train(
        cfg, event_budget=32, result_dir=str(tmp_path / "dctpms"))
    # 8 train sessions / 4 data shards = 2 sessions per shard ->
    # 2 batches/epoch -> one full K=2 window per epoch, 4 steps total
    assert int(state.step) == 4
    assert np.isfinite(metrics["val_mAP"])
    specs = {ax for p in jax.tree_util.tree_leaves(state.params)
             if hasattr(p, "sharding")
             for part in p.sharding.spec if part
             for ax in (part if isinstance(part, tuple) else (part,))}
    assert "model" in specs


@pytest.mark.slow
def test_flagship_trainer_with_steps_per_dispatch(synth_root, tmp_path):
    """flagship --device_mining --device_cache --steps_per_dispatch 2:
    the scanned three-modality fused step trains; every step logged."""
    import json

    from multimodal_similarity_tpu.train.trainers import multimodal_model
    cfg = TrainConfig(
        DATA_ROOT=synth_root, name="mmspd", network="convrtsn",
        feat=["resnet", "sensors", "segment"], n_input=8, n_h=2, n_w=2,
        n_C=4, emb_dim=16, num_seg=N_SEG, sess_per_batch=2, max_epochs=2,
        triplet_per_batch=12, learning_rate=0.01, keep_prob=0.9,
        lambda_multimodal=0.5, multimodal_epochs=0, label_num=4,
        silent_mode=True, device_cache=True,
        steps_per_dispatch=2).resolve()
    cfg.feat_dim["segment"] = (16,)
    state, metrics, rd = multimodal_model.train(
        cfg, device_mining=True, event_budget=32,
        result_dir=str(tmp_path / "mmspd"))
    assert int(state.step) >= 2
    assert np.isfinite(metrics["val_mAP"])
    recs = [json.loads(l) for l in open(rd + "/metrics.jsonl")]
    train_steps = [r["step"] for r in recs if "loss" in r]
    assert train_steps == list(range(1, int(state.step) + 1))


def test_steps_per_dispatch_requires_device_cache(synth_root):
    with pytest.raises(ValueError, match="steps_per_dispatch"):
        TrainConfig(DATA_ROOT=synth_root, feat="sensors",
                    steps_per_dispatch=4).resolve()


def test_multistep_dispatch_on_mesh(synth_root):
    """--steps_per_dispatch composes with the dp mesh: lax.scan over the
    shard_map gather + ring-loss body compiles and steps K times in one
    program on 8 virtual devices."""
    import jax
    import jax.numpy as jnp

    from multimodal_similarity_tpu.models import build_encoder
    from multimodal_similarity_tpu.ops.mining import select_batch_balanced
    from multimodal_similarity_tpu.parallel import create_mesh
    from multimodal_similarity_tpu.train.state import (
        TrainState, build_optimizer)
    from multimodal_similarity_tpu.train.trainers.base_model_batchhard import (
        make_balanced_batch_step)
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = create_mesh(8)
    cfg = TrainConfig(DATA_ROOT=synth_root, feat="sensors",
                      network="rtsn", n_input=8, emb_dim=16, num_seg=N_SEG,
                      keep_prob=0.9, silent_mode=True, device_cache=True,
                      steps_per_dispatch=2).resolve()
    dataset = prepare_dataset(cfg.feature_root, cfg.train_session,
                              "sensors", cfg.label_root, "goal")
    cache = DeviceFeatureCache.build(
        dataset, n_seg=N_SEG, sess_per_batch=2, event_budget=32, seed=4,
        mesh=mesh)
    model = build_encoder("rtsn", num_seg=N_SEG, emb_dim=16, n_input=8,
                          keep_prob=0.9)
    from jax.sharding import NamedSharding, PartitionSpec as P
    state = jax.device_put(
        TrainState.create(model.init(jax.random.PRNGKey(0),
                                     jnp.zeros((2, N_SEG, 8)))["params"],
                          build_optimizer("ADAM", 0.01)),
        NamedSharding(mesh, P()))

    import itertools
    import random as _random
    sel_rng = _random.Random(5)
    K = 2
    wins = []
    plans = itertools.chain.from_iterable(
        cache.epoch_plans() for _ in range(8))
    while len(wins) < K:
        plan = next(plans)
        valid = np.where(plan["mask_host"] > 0)[0]
        idx = select_batch_balanced(plan["labels_host"][valid], 16,
                                    rng=sel_rng)
        if idx.size == 0:
            continue
        wins.append((plan["packed"], valid[idx].astype(np.int32),
                     plan["labels_host"][valid[idx]]))
    multi = make_balanced_batch_step(model, cfg, "batchhard", mesh=mesh,
                                     cache=cache, steps_per_dispatch=K)
    state, auxs = multi(
        state, np.stack([w[0] for w in wins]),
        np.stack([w[1] for w in wins]),
        np.stack([w[2] for w in wins]),
        jnp.stack([jax.random.PRNGKey(7), jax.random.PRNGKey(8)]),
        jnp.float32(0.01), *cache.step_operands())
    assert int(state.step) == K
    assert np.all(np.isfinite(np.asarray(auxs["loss"])))


def test_fused_cached_step_on_mesh(synth_root, tmp_path):
    """shard_map gather inside the jitted dp step: one dispatch per batch
    on an 8-device mesh, matching the two-call mesh path."""
    import jax
    import jax.numpy as jnp

    from multimodal_similarity_tpu.models import build_encoder
    from multimodal_similarity_tpu.parallel import create_mesh
    from multimodal_similarity_tpu.train.cached_steps import (
        make_cached_triplet_step)
    from multimodal_similarity_tpu.train.state import (
        TrainState, build_optimizer)
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = create_mesh(8)
    cfg = TrainConfig(DATA_ROOT=synth_root, feat="sensors").resolve()
    dataset = prepare_dataset(cfg.feature_root, cfg.train_session,
                              "sensors", cfg.label_root, "goal")
    cache = DeviceFeatureCache.build(
        dataset, n_seg=N_SEG, sess_per_batch=1, event_budget=32, seed=4,
        mesh=mesh)
    model = build_encoder("rtsn", num_seg=N_SEG, emb_dim=16, n_input=8,
                          keep_prob=0.9)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, N_SEG, 8)))["params"]
    from jax.sharding import NamedSharding, PartitionSpec as P
    state = jax.device_put(
        TrainState.create(params, build_optimizer("ADAM", 0.01)),
        NamedSharding(mesh, P()))
    fused = make_cached_triplet_step(model, cache, triplet_per_batch=8,
                                     alpha=0.2)
    losses = []
    for plan in cache.epoch_plans():
        state, aux = fused(state, plan["packed"],
                           jax.random.PRNGKey(int(state.step)),
                           jnp.float32(0.01), *cache.step_operands())
        losses.append(float(aux["loss"]))
    assert losses and all(np.isfinite(l) for l in losses)
    assert int(state.step) == len(losses)


# -- generic cached-body path (round 4 widening: every HondaExperiment
# -- trainer can ride the cache via cached_steps.make_cached_body_step) ----


@pytest.mark.slow
def test_cached_body_step_matches_two_call_path(synth_root):
    """make_cached_body_step fuses an ARBITRARY trainer body with the
    cache gather; must match the two-call oracle (cache._gather under the
    key's first split -> raw body under the second) bit-for-bit.  Uses
    the multitask triplet+verification body — in-step semi-hard mining,
    two heads — as the representative."""
    import jax
    import jax.numpy as jnp

    from multimodal_similarity_tpu.models import PairSim2, build_encoder
    from multimodal_similarity_tpu.train.cached_steps import (
        make_cached_body_step)
    from multimodal_similarity_tpu.train.state import (
        TrainState, build_optimizer)
    from multimodal_similarity_tpu.train.trainers.multitask_model import (
        make_multitask_step)

    cfg = TrainConfig(
        DATA_ROOT=synth_root, feat="sensors", network="rtsn", n_input=8,
        emb_dim=16, num_seg=N_SEG, triplet_per_batch=8, lambda_ver=0.5,
        keep_prob=0.9).resolve()
    dataset = prepare_dataset(cfg.feature_root, cfg.train_session,
                              "sensors", cfg.label_root, "goal")
    cache = DeviceFeatureCache.build(
        dataset, n_seg=N_SEG, sess_per_batch=2, event_budget=24, seed=9)

    import jax.random as jrandom
    encoder = build_encoder("rtsn", num_seg=N_SEG, emb_dim=16, n_input=8,
                            keep_prob=0.9)
    ver = PairSim2(n_input=16, keep_prob=0.9)
    enc_p = encoder.init(jrandom.PRNGKey(0),
                         jnp.zeros((2, N_SEG, 8)))["params"]
    e0 = jnp.zeros((2, 16), jnp.float32)
    ver_p = ver.init(jrandom.PRNGKey(1), e0, e0, method="score")["params"]
    params = {"encoder": enc_p, "ver": ver_p}

    def fresh_state():
        p = jax.tree.map(lambda a: np.array(a), params)
        return TrainState.create(p, build_optimizer("ADAM", 0.01))

    raw = make_multitask_step(encoder, ver, cfg, jit=False)
    fused = make_cached_body_step(
        lambda st, ev, lab, m, k, lr: raw(st, ev[0], lab, m, k, lr), cache)
    plan = next(cache.epoch_plans())
    key = jrandom.PRNGKey(5)
    s1, aux1 = fused(fresh_state(), plan["packed"], key, jnp.float32(0.01),
                     *cache.step_operands())

    k_gather, k_body = jrandom.split(key)
    gathered, labels, mask = cache._gather(
        k_gather, jnp.asarray(plan["packed"][0]), *cache.step_operands())
    s2, aux2 = jax.jit(raw)(fresh_state(), gathered[0], labels, mask,
                            k_body, jnp.float32(0.01))

    assert float(aux1["loss"]) == float(aux2["loss"])
    assert float(aux1["ver_acc"]) == float(aux2["ver_acc"])
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_cache_meanpool_modality_matches_host_mean(synth_root):
    """modality_modes=("tsn", "meanpool"): the pooled modality must equal
    the masked frame mean of the DEQUANTIZED stored window (the device
    twin of mean_pool_input; the only approximation vs the streamed f32
    target is int8 storage itself)."""
    cfg = TrainConfig(DATA_ROOT=synth_root, feat="sensors").resolve()
    dataset = prepare_multimodal_dataset(
        cfg.feature_root, cfg.train_session, ["resnet", "sensors"],
        cfg.label_root, "goal")
    cache = DeviceFeatureCache.build(
        dataset, n_seg=N_SEG, sess_per_batch=2, event_budget=16, seed=3,
        modality_modes=("tsn", "meanpool"))
    assert cache is not None
    windows, lens, _ = _load_all_windows(dataset, 1)   # sensors [N, T, 8]
    q, s = quantize_features(windows)
    deq = q.astype(np.float32) * s

    batch = next(cache.epoch_batches())
    # tsn modality keeps the int8 dict form; pooled modality is dense
    assert isinstance(batch["events"], dict)
    pooled = np.asarray(batch["events2"])
    assert pooled.ndim == 2 and pooled.shape[1] == 8
    mask = np.asarray(batch["mask"])
    idx = batch["global_indices"]
    for i in np.where(mask > 0)[0]:
        expected = deq[idx[i], : lens[idx[i]]].mean(axis=0)
        np.testing.assert_allclose(pooled[i], expected, rtol=1e-5,
                                   atol=1e-6)


def test_cache_rejects_bad_modality_modes(synth_root):
    cfg = TrainConfig(DATA_ROOT=synth_root, feat="sensors").resolve()
    dataset = prepare_dataset(cfg.feature_root, cfg.train_session,
                              "sensors", cfg.label_root, "goal")
    with pytest.raises(ValueError, match="modality_modes"):
        DeviceFeatureCache.build(dataset, n_seg=N_SEG, sess_per_batch=2,
                                 event_budget=16, seed=0,
                                 modality_modes=("tsn", "meanpool"))
    with pytest.raises(ValueError, match="unknown modality modes"):
        DeviceFeatureCache.build(dataset, n_seg=N_SEG, sess_per_batch=2,
                                 event_budget=16, seed=0,
                                 modality_modes=("maxpool",))


def test_multitask_trainer_with_device_cache(synth_root, tmp_path):
    """--device_cache + --steps_per_dispatch on the multitask trainer:
    trains end-to-end from the resident cache (scanned K-step windows +
    the K=1 tail) and validates finitely."""
    from multimodal_similarity_tpu.train.trainers import multitask_model
    cfg = TrainConfig(
        DATA_ROOT=synth_root, name="mtdc", network="rtsn", feat="sensors",
        n_input=8, emb_dim=16, num_seg=N_SEG, sess_per_batch=2,
        max_epochs=2, triplet_per_batch=16, lambda_ver=0.5,
        learning_rate=0.01, keep_prob=0.9, silent_mode=True,
        device_cache=True, steps_per_dispatch=2).resolve()
    state, metrics, rd = multitask_model.train(
        cfg, event_budget=24, result_dir=str(tmp_path / "mtdc"))
    assert int(state.step) >= 2
    assert np.isfinite(metrics["val_mAP"])
    # deferred logging recorded every step in order
    import json
    recs = [json.loads(l) for l in
            open(rd + "/metrics.jsonl").read().strip().split("\n")]
    train_steps = [r["step"] for r in recs if "loss" in r]
    assert train_steps == list(range(1, int(state.step) + 1))


def test_cache_build_beats_watchdog_per_session(synth_root):
    """The build is the longest host stretch a trainer runs with an
    armed hang watchdog (tens of seconds of disk reads + quantize on a
    real corpus); the ``beat`` hook must fire once per loaded session so
    a step-sized --watchdog_secs never false-fires during it.  All
    trainer cache builds pass exp.beat_fn through."""
    cfg = TrainConfig(DATA_ROOT=synth_root, feat="sensors").resolve()
    dataset = prepare_dataset(cfg.feature_root, cfg.train_session,
                              "sensors", cfg.label_root, "goal")
    beats = []
    cache = DeviceFeatureCache.build(
        dataset, n_seg=N_SEG, sess_per_batch=2, event_budget=24, seed=7,
        beat=lambda: beats.append(1))
    assert cache is not None
    assert len(beats) == len(dataset)


def test_cache_build_workers_bit_identical(synth_root):
    """The threaded build (workers=4; the default is min(4, runnable
    cores), so multi-core hosts take this path) stages in submission
    order: every uploaded byte and every plan matches the sequential
    workers=1 build exactly — multimodal, on the 8-shard mesh."""
    import jax

    from multimodal_similarity_tpu.parallel import create_mesh
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = TrainConfig(DATA_ROOT=synth_root,
                      feat=["sensors", "segment"]).resolve()
    dataset = prepare_multimodal_dataset(
        cfg.feature_root, cfg.train_session, ["sensors", "segment"],
        cfg.label_root, "goal")
    mesh = create_mesh(8)
    builds = [DeviceFeatureCache.build(
        dataset, n_seg=N_SEG, sess_per_batch=1, event_budget=32, seed=5,
        mesh=mesh, workers=w) for w in (1, 4)]
    seq, par = builds
    assert par.device_bytes == seq.device_bytes
    for a, b in zip(seq.q + seq.scale + [seq.seq_len, seq.label_dev],
                    par.q + par.scale + [par.seq_len, par.label_dev]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for ba, bb in zip(seq.epoch_batches(), par.epoch_batches()):
        np.testing.assert_array_equal(ba["global_indices"],
                                      bb["global_indices"])
        np.testing.assert_array_equal(np.asarray(ba["events"]["q"]),
                                      np.asarray(bb["events"]["q"]))
        np.testing.assert_array_equal(np.asarray(ba["events2"]["q"]),
                                      np.asarray(bb["events2"]["q"]))


def test_aux_trainer_cache_is_mesh_sharded(synth_root, tmp_path):
    """HondaExperiment.build_cache shards the aux trainers' caches over a
    local auto_mesh (VERDICT r4 directive #5 — it used to hard-code
    mesh=None, leaving multitask/PDDM/SAE/cross-prediction caches
    single-device even with a mesh available)."""
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from multimodal_similarity_tpu.train.trainers._honda import (
        HondaExperiment)
    cfg = TrainConfig(
        DATA_ROOT=synth_root, name="auxdc", network="rtsn", feat="sensors",
        n_input=8, emb_dim=16, num_seg=N_SEG, sess_per_batch=2,
        max_epochs=1, learning_rate=0.01, keep_prob=0.9, silent_mode=True,
        device_cache=True).resolve()
    exp = HondaExperiment(cfg, event_budget=24,
                          result_dir=str(tmp_path / "auxdc"))
    try:
        cache = exp.build_cache()
        assert cache is not None and cache.mesh is not None
        assert cache.n_shards == 8
        assert exp.event_budget == 24  # 24 % 8 == 0: no rounding needed
        # the resident feature rows really live sharded over "data"
        assert cache.q[0].sharding.spec[0] == "data"
        assert exp.batch_per_epoch == cache.batches_per_epoch

        # fewer sessions than shards: the sharded build declines and
        # build_cache retries unsharded rather than losing the cache
        exp.local_set = exp.local_set[:3]
        exp.event_budget = 24
        cache2 = exp.build_cache()
        assert cache2 is not None and cache2.mesh is None
    finally:
        exp.close()


@pytest.mark.slow
def test_pddm_trainer_with_device_cache(synth_root, tmp_path):
    from multimodal_similarity_tpu.train.trainers import pddm_model
    cfg = TrainConfig(
        DATA_ROOT=synth_root, name="pddc", network="rtsn", feat="sensors",
        n_input=8, emb_dim=16, num_seg=N_SEG, sess_per_batch=2,
        max_epochs=1, triplet_per_batch=16, learning_rate=0.01,
        keep_prob=0.9, silent_mode=True, device_cache=True).resolve()
    state, metrics, _ = pddm_model.train(
        cfg, event_budget=24, result_dir=str(tmp_path / "pddc"))
    assert int(state.step) >= 1
    assert np.isfinite(metrics["val_mAP_PDDM"])


@pytest.mark.slow
def test_sae_trainer_with_device_cache(synth_root, tmp_path):
    from multimodal_similarity_tpu.train.trainers import (
        unimodal_pretrain_sae)
    cfg = TrainConfig(
        DATA_ROOT=synth_root, name="saedc", network="rtsn", feat="sensors",
        n_input=8, emb_dim=16, num_seg=N_SEG, sess_per_batch=2,
        max_epochs=1, learning_rate=0.01, keep_prob=0.9,
        silent_mode=True, device_cache=True).resolve()
    state, metrics, _ = unimodal_pretrain_sae.train(
        cfg, event_budget=24, result_dir=str(tmp_path / "saedc"))
    assert int(state.step) >= 1
    assert np.isfinite(metrics["val_mse"])


@pytest.mark.slow
def test_cross_prediction_trainer_with_device_cache(synth_root, tmp_path):
    """--device_cache on cross_prediction: the video modality gathers TSN
    segments, the target modality mean-pools ON DEVICE."""
    from multimodal_similarity_tpu.train.trainers import cross_prediction
    cfg = TrainConfig(
        DATA_ROOT=synth_root, name="cxdc", network="convrtsn",
        feat=["resnet", "sensors"], n_h=2, n_w=2, n_C=4, n_input=8,
        emb_dim=16, num_seg=N_SEG, sess_per_batch=2, max_epochs=1,
        learning_rate=0.01, keep_prob=0.9, silent_mode=True,
        device_cache=True).resolve()
    state, metrics, _ = cross_prediction.train(
        cfg, event_budget=24, result_dir=str(tmp_path / "cxdc"))
    assert int(state.step) >= 1
    assert np.isfinite(metrics["train_mse"])
