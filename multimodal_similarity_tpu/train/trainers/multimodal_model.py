"""Flagship semi-supervised multimodal trainer.

Reference: src/multimodal_model.py:144-580.  Three branches: a trainable
core video encoder, plus frozen-tower sensors/segment RTSN+PDDM branches
restored from pddm_model runs.  Each batch:

1. facenet semi-hard triplets from core embeddings (labeled supervision);
2. from epoch >= multimodal_epochs, an all-pairs fused PDDM pseudo-
   similarity matrix (0.5 * (sensors + segment), reference :264-266) —
   computed blockwise ON DEVICE instead of the reference's O(N^2) host
   scoring loop (:459-475);
3. hard mining (same-label low-sim positives / diff-label high-sim
   negatives) and structure mining (same-class-as-hard-negative far
   negatives with per-class adaptive margins from dist_dict)
   (select_triplets_mul, reference :72-142);
4. one jitted step with three masked triplet groups replacing the
   reference's nested tf.cond loss staging (:292-297).

The dist_dict (per-class mean pairwise validation distance) is initialized
before training and appended at epoch 50 / every 200 epochs (:383-391,
:566-573).
"""

from __future__ import annotations

import functools
import os
import random
import pickle
import sys
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_similarity_tpu.configs import TrainConfig
from multimodal_similarity_tpu.models import (
    PDDM, RTSN, build_encoder, score_all_pairs_sym)
from multimodal_similarity_tpu.ops.distances import all_diffs, cdist
from multimodal_similarity_tpu.ops.losses import triplet_loss_masked
from multimodal_similarity_tpu.ops.mining import select_triplets_facenet
from multimodal_similarity_tpu.train.checkpoints import load_pytree
from multimodal_similarity_tpu.train.state import (
    TrainState, build_optimizer, l2_regularization, learning_rate_schedule)
from multimodal_similarity_tpu.train.steps import (
    jit_step, l2_normalize, make_embed_fn)
from multimodal_similarity_tpu.train.trainer import (
    cached_device, epoch_of_step)
from multimodal_similarity_tpu.train.trainers._honda import HondaExperiment

SENSORS_EMB_DIM = 32
SEGMENT_EMB_DIM = 32


def select_triplets_mul(triplet_input_idx, lab, sim_prob, dist_dict,
                        triplet_per_batch, triplet_per_event=2,
                        threshold_up=0.65, threshold_down=0.35, rng=None,
                        mine_struct=True):
    """Hard + structure mining from pseudo-similarities
    (reference :72-142, semantics-exact).  ``rng`` (RandomState) makes the
    anchor sweep / pair shuffle / far-negative draw repeatable.
    ``mine_struct=False`` is the hard-mining-only ablation
    (multimodal_model_hardonly.py:71-126): no structure triplets, and the
    selection is capped at exactly ``triplet_per_batch`` mined pairs."""
    rng = rng or np.random
    lab = np.asarray(lab).reshape(-1, 1)

    triplet_selected = []
    for i in range(0, len(triplet_input_idx), 3):
        triplet = (triplet_input_idx[i], triplet_input_idx[i + 1],
                   triplet_input_idx[i + 2])
        if triplet not in triplet_selected:
            triplet_selected.append(triplet)

    triplet_count = len(triplet_selected)
    adjacency = np.equal(lab, lab.T)

    struct_selected: List[tuple] = []
    margins: List[float] = []
    for i in rng.permutation(lab.shape[0]):
        if lab[i] > 0:
            hard_pos = np.where(np.logical_and(
                adjacency[i], sim_prob[i] < threshold_down))[0]
            hard_neg = np.where(np.logical_and(
                ~adjacency[i], sim_prob[i] > threshold_up))[0]

            if len(hard_pos) == 0:
                all_pos = np.where(adjacency[i])[0]
                if len(all_pos) == 1:
                    continue
                sim = sim_prob[i, all_pos]
                hard_pos = np.array([all_pos[np.nanargmin(sim)]], "int32")
            if len(hard_neg) == 0:
                all_neg = np.where(~adjacency[i])[0]
                if len(all_neg) == 1:
                    continue
                sim = sim_prob[i, all_neg]
                hard_neg = np.array([all_neg[np.nanargmax(sim)]], "int32")

            hard_comb = [(hp, hn) for hn in hard_neg for hp in hard_pos]
            rng.shuffle(hard_comb)
            for count in range(min(triplet_per_event, len(hard_comb))):
                hp, hn = hard_comb[count]
                triplet = (i, hp, hn)
                if triplet not in triplet_selected:
                    triplet_selected.append(triplet)
                    if not mine_struct:
                        continue
                    far_neg = np.where(np.logical_and(
                        np.squeeze(lab) == lab[hn],
                        sim_prob[i] < threshold_down))[0]
                    if len(far_neg):
                        fn = rng.choice(far_neg)
                        triplet = (i, hn, fn)
                        if triplet not in struct_selected:
                            struct_selected.append(triplet)
                            margins.append(dist_dict[int(lab[fn, 0])][-1])

        if (len(struct_selected) + len(triplet_selected) - triplet_count
                >= triplet_per_batch):
            break

    if not mine_struct:
        triplet_selected = triplet_selected[: triplet_count
                                            + triplet_per_batch]
    hard_count = len(triplet_selected) - triplet_count
    struct_selected = struct_selected[: triplet_per_batch - hard_count]
    struct_count = len(struct_selected)
    margins = margins[:struct_count]

    triplet_input_idx = [idx for tri in triplet_selected + struct_selected
                         for idx in tri]
    return triplet_input_idx, margins, triplet_count, hard_count, struct_count


def init_dist_dict(val_embeddings, val_labels, metric) -> Dict[int, list]:
    """Per-class mean pairwise distance on validation embeddings
    (reference :383-391)."""
    val_labels = np.asarray(val_labels).reshape(-1)
    dist_dict: Dict[int, list] = {}
    for i in range(int(np.max(val_labels)) + 1):
        temp = val_embeddings[np.where(val_labels == i)[0]]
        dist_dict[i] = [float(np.mean(cdist(all_diffs(
            jnp.asarray(temp), jnp.asarray(temp)), metric)))
            if temp.shape[0] else 0.0]
    return dist_dict


def build_models(cfg: TrainConfig, sensors_dim: int = 8,
                 segment_dim: int = 357):
    """Auxiliary input dims come from the loaded data, not config, so the
    same CLI works for real 357-d segment histograms and any other data
    honoring the on-disk contract."""
    core = build_encoder(cfg.network, num_seg=cfg.num_seg,
                         emb_dim=cfg.emb_dim, n_input=cfg.n_input,
                         n_h=cfg.n_h, n_w=cfg.n_w, n_C=cfg.n_C,
                         keep_prob=cfg.keep_prob)
    sensors_enc = RTSN(n_seg=cfg.num_seg, emb_dim=SENSORS_EMB_DIM,
                       n_input=sensors_dim, keep_prob=cfg.keep_prob)
    sensors_pddm = PDDM(n_input=SENSORS_EMB_DIM)
    segment_enc = RTSN(n_seg=cfg.num_seg, emb_dim=SEGMENT_EMB_DIM,
                       n_input=segment_dim, keep_prob=cfg.keep_prob)
    segment_pddm = PDDM(n_input=SEGMENT_EMB_DIM)
    return core, sensors_enc, sensors_pddm, segment_enc, segment_pddm


def make_mm_fused_step(core, sensors_enc, sensors_pddm, segment_enc,
                       segment_pddm, cfg: TrainConfig, mesh=None,
                       hard_only: bool = False, gather_smalls: bool = False,
                       cache=None, steps_per_dispatch: int = 1):
    """Fully-fused flagship step: ONE jitted program per batch.

    Inside the program: eval-mode core embed -> device semi-hard mining of
    the labeled triplets; frozen-tower sensors/segment embeds -> blockwise
    fused PDDM similarity matrix -> device hard + structure mining with
    dist_dict margins; gather; train-mode re-forward; three masked triplet
    losses.  No host hop remains (the reference paid three per batch,
    multimodal_model.py:443-520).

    With ``mesh`` (a 1-D "data" mesh) the step runs data-parallel: the
    event batch and the re-forward triplet batch are sharded on the batch
    axis (the ConvRTSN forward/backward — the dominant cost at Honda video
    dims — splits across chips; XLA SPMD inserts the ICI collectives),
    the small core embeddings are all-gathered for the global mining pass,
    parameters are replicated, and the gradients psum.  The tiny 32-d
    sensors/segment towers + PDDM scoring are replicated — they are ~1%%
    of step FLOPs at reference dims.

    With ``cache`` (a data/device_cache.DeviceFeatureCache over all three
    modalities) the step ALSO subsumes the per-epoch TSN gather: its
    signature becomes ``(state, packed, class_margins, use_multimodal,
    key, learning_rate, *cache.step_operands())`` and a batch costs one
    KB-scale packed upload + one dispatch — the cached twin of the
    on-device-data step (same pattern as train/cached_steps.py).
    """
    from multimodal_similarity_tpu.models import score_rows
    from multimodal_similarity_tpu.ops.mining import (
        mine_hard_structure_triplets_rowwise,
        mine_semihard_triplets_from_embeddings,
    )

    lab_cap = cfg.triplet_per_batch
    hard_cap = cfg.triplet_per_batch
    struct_cap = cfg.triplet_per_batch // 2
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        data_s = NamedSharding(mesh, P("data"))
        repl_s = NamedSharding(mesh, P())

    def step(state, events, eve_sensors, eve_segment, labels, mask,
             class_margins, use_multimodal, key, learning_rate):
        from multimodal_similarity_tpu.train.steps import (
            dequant_features, take_features)
        eve_sensors = dequant_features(eve_sensors)
        eve_segment = dequant_features(eve_segment)
        k_mine, k_mul, k_drop = jax.random.split(key, 3)
        if gather_smalls:
            # multihost feeding: labels/mask arrive sharded on the batch
            # axis (each host holds only its local rows); gather them to
            # replicated before the global mining passes (KB-scale
            # all-gather over ICI)
            labels = jax.lax.with_sharding_constraint(labels, repl_s)
            mask = jax.lax.with_sharding_constraint(mask, repl_s)

        def loss_fn(params):
            emb_mine = core.apply({"params": params["modality_core"]},
                                  dequant_features(events))
            if cfg.normalized:
                emb_mine = l2_normalize(emb_mine)
            if mesh is not None:
                # gather the small embedding matrix for global mining
                emb_mine = jax.lax.with_sharding_constraint(emb_mine, repl_s)
            emb_mine = jax.lax.stop_gradient(emb_mine)
            lab_mined = mine_semihard_triplets_from_embeddings(
                emb_mine, labels, k_mine, lab_cap, alpha=cfg.alpha,
                num_negative=cfg.num_negative, valid=mask,
                metric=cfg.metric)

            es = sensors_enc.apply(
                {"params": params["modality_sensors"]["encoder"]},
                eve_sensors)
            eg = segment_enc.apply(
                {"params": params["modality_segment"]["encoder"]},
                eve_segment)
            if mesh is not None:
                es = jax.lax.with_sharding_constraint(es, repl_s)
                eg = jax.lax.with_sharding_constraint(eg, repl_s)

            # mega-batch pseudo-similarity: score ONLY the sampled anchors'
            # rows (O(H*N) head evals / memory) instead of the [N, N]
            # matrix — the same scaling trick as the labeled semi-hard
            # miner, so PDDM-mined training accepts the same N
            def score_rows_fn(rows):
                sim_s = score_rows(functools.partial(
                    sensors_pddm.apply,
                    {"params": params["modality_sensors"]["pddm"]},
                    method="score"), es, rows)
                sim_g = score_rows(functools.partial(
                    segment_pddm.apply,
                    {"params": params["modality_segment"]["pddm"]},
                    method="score"), eg, rows)
                return jax.lax.stop_gradient(0.5 * (sim_s + sim_g))

            mul = mine_hard_structure_triplets_rowwise(
                score_rows_fn, labels, class_margins, k_mul,
                hard_budget=hard_cap, struct_budget=struct_cap,
                threshold_up=0.8, threshold_down=0.2, valid=mask)

            # the miner rounds its budget up to a num_negative multiple;
            # derive group sizes from the actual (static) array lengths
            lab_t = lab_mined.anchor.shape[0]
            tri_cap = lab_t + hard_cap + struct_cap
            gather = jnp.concatenate([
                jnp.stack([lab_mined.anchor, lab_mined.positive,
                           lab_mined.negative], axis=1).reshape(-1),
                mul.hard.reshape(-1),
                mul.struct.reshape(-1),
            ])
            mask_lab = jnp.concatenate(
                [lab_mined.mask, jnp.zeros(hard_cap + struct_cap)])
            mm = mul.hard_mask * use_multimodal
            # hard-only ablation: the structure term is dropped entirely
            # (multimodal_model_hardonly semantics; reference :369-393)
            sm = (jnp.zeros_like(mul.struct_mask) if hard_only
                  else mul.struct_mask * use_multimodal)
            mask_hard = jnp.concatenate(
                [jnp.zeros(lab_t), mm, jnp.zeros(struct_cap)])
            mask_struct = jnp.concatenate(
                [jnp.zeros(lab_t + hard_cap), sm])
            margins = jnp.concatenate(
                [jnp.zeros(lab_t + hard_cap), mul.margins])

            # gather in the feed's storage dtype (int8 rows are 4x
            # cheaper), dequantizing only the selected triplets
            tri_events = dequant_features(take_features(events, gather))
            if mesh is not None:
                # re-forward batch sharded over chips too
                tri_events = jax.lax.with_sharding_constraint(
                    tri_events, data_s)
            emb = core.apply({"params": params["modality_core"]},
                             tri_events, train=True,
                             rngs={"dropout": k_drop})
            if cfg.normalized:
                emb = l2_normalize(emb)
            tri = emb.reshape(tri_cap, 3, -1)
            a, p, n = tri[:, 0], tri[:, 1], tri[:, 2]
            loss1 = triplet_loss_masked(a, p, n, mask_lab, cfg.alpha)
            loss2 = triplet_loss_masked(a, p, n, mask_hard, cfg.alpha)
            pd = jnp.sum(jnp.square(a - p), axis=1)
            nd = jnp.sum(jnp.square(a - n), axis=1)
            basic = jnp.maximum(pd - nd + margins, 0.0)
            loss3 = jnp.sum(basic * mask_struct) / jnp.maximum(
                jnp.sum(mask_struct), 1.0)
            total = loss1 + (loss2 + loss3 * 0.3) * cfg.lambda_multimodal
            if cfg.lambda_l2:
                total = total + cfg.lambda_l2 * l2_regularization(params)
            return total, {"loss": total, "metric_loss1": loss1,
                           "metric_loss2": loss2, "metric_loss3": loss3,
                           "triplet_count": jnp.sum(lab_mined.mask),
                           "hard_count": jnp.sum(mm),
                           "struct_count": jnp.sum(sm),
                           "active_count": lab_mined.active_count}

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads, learning_rate=learning_rate)
        return state, aux

    if cache is not None:
        # fused gather+train: TSN-select all three modalities from the
        # device-resident int8 cache INSIDE this program, then run the
        # identical mine->re-forward->update body.  Key split mirrors
        # train/cached_steps.py: (gather, rest) so the body's own 3-way
        # split stays comparable to the two-call path under k_rest.
        gather_fn = cache.gather_fn

        def cached(state, packed, class_margins, use_multimodal, key,
                   learning_rate, seq_len, label_table, *mods):
            k_gather, k_rest = jax.random.split(key)
            if mesh is None:
                packed_local = packed[0] if packed.ndim == 2 else packed
                gathered, labels, mask = gather_fn(
                    k_gather, packed_local, seq_len, label_table, *mods)
            else:
                gathered, labels, mask = gather_fn(
                    k_gather, packed, seq_len, label_table, *mods)
            events, eve_sensors, eve_segment = gathered
            return step(state, events, eve_sensors, eve_segment, labels,
                        mask, class_margins, use_multimodal, k_rest,
                        learning_rate)

        if steps_per_dispatch > 1:
            # --steps_per_dispatch: K whole mine+train steps per program
            # (lax.scan over the fused cached body; class_margins /
            # use_multimodal are epoch constants, cache operands are
            # loop-invariant scan residuals)
            def cached_multi(state, packed_k, class_margins,
                             use_multimodal, keys_k, learning_rate,
                             seq_len, label_table, *mods):
                def body(st, xs):
                    packed, key = xs
                    return cached(st, packed, class_margins,
                                  use_multimodal, key, learning_rate,
                                  seq_len, label_table, *mods)
                return jax.lax.scan(body, state, (packed_k, keys_k))

            if mesh is None:
                return jit_step(cached_multi)
            from jax.sharding import NamedSharding, PartitionSpec as P
            packed_ks = NamedSharding(mesh, P(None, "data", None))
            row = lambda a: NamedSharding(  # noqa: E731
                mesh, P("data", *([None] * (a.ndim - 1))))
            operand_s = tuple(row(a) for a in cache.step_operands())
            return jit_step(cached_multi, in_shardings=(
                None, packed_ks, repl_s, repl_s, repl_s, repl_s,
                *operand_s))

        if mesh is None:
            return jit_step(cached)
        from jax.sharding import NamedSharding, PartitionSpec as P
        packed_s = NamedSharding(mesh, P("data", None))
        row = lambda a: NamedSharding(  # noqa: E731
            mesh, P("data", *([None] * (a.ndim - 1))))
        operand_s = tuple(row(a) for a in cache.step_operands())
        return jit_step(cached, in_shardings=(
            None, packed_s, repl_s, repl_s, repl_s, repl_s, *operand_s))

    if mesh is None:
        return jit_step(step)
    small = data_s if gather_smalls else repl_s
    in_shardings = (None,                      # state: placed by the caller
                    data_s, data_s, data_s,    # events, sensors, segment
                    small, small, repl_s,      # labels, mask, class_margins
                    repl_s, repl_s, repl_s)    # use_multimodal, key, lr
    return jit_step(step, in_shardings=in_shardings)


def make_mm_train_step(core, cfg: TrainConfig, tri_cap: int):
    """step over [3 * tri_cap] gathered core-events with three masked
    triplet groups: labeled / hard / struct(margins)."""

    def step(state, tri_events, mask_lab, mask_hard, mask_struct, margins,
             key, learning_rate):
        def loss_fn(params):
            emb = core.apply({"params": params["modality_core"]}, tri_events,
                             train=True, rngs={"dropout": key})
            if cfg.normalized:
                emb = l2_normalize(emb)
            tri = emb.reshape(tri_cap, 3, -1)
            a, p, n = tri[:, 0], tri[:, 1], tri[:, 2]
            loss1 = triplet_loss_masked(a, p, n, mask_lab, cfg.alpha)
            loss2 = triplet_loss_masked(a, p, n, mask_hard, cfg.alpha)
            pd = jnp.sum(jnp.square(a - p), axis=1)
            nd = jnp.sum(jnp.square(a - n), axis=1)
            basic = jnp.maximum(pd - nd + margins, 0.0)
            loss3 = jnp.sum(basic * mask_struct) / jnp.maximum(
                jnp.sum(mask_struct), 1.0)
            total = loss1 + (loss2 + loss3 * 0.3) * cfg.lambda_multimodal
            if cfg.lambda_l2:
                total = total + cfg.lambda_l2 * l2_regularization(params)
            return total, {"loss": total, "metric_loss1": loss1,
                           "metric_loss2": loss2, "metric_loss3": loss3}

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads, learning_rate=learning_rate)
        return state, aux

    return jit_step(step)


def make_fused_sim_fn(sensors_enc, sensors_pddm, segment_enc, segment_pddm,
                      cfg):
    """[N] sensors+segment events -> fused [N, N] PDDM similarity matrix."""

    @jax.jit
    def fused_sim(params, eve_sensors, eve_segment):
        es = sensors_enc.apply(
            {"params": params["modality_sensors"]["encoder"]}, eve_sensors)
        eg = segment_enc.apply(
            {"params": params["modality_segment"]["encoder"]}, eve_segment)
        block = min(128, es.shape[0])
        sim_s = score_all_pairs_sym(functools.partial(
            sensors_pddm.apply, {"params": params["modality_sensors"]["pddm"]},
            method="score"), es, block=block)
        sim_g = score_all_pairs_sym(functools.partial(
            segment_pddm.apply, {"params": params["modality_segment"]["pddm"]},
            method="score"), eg, block=block)
        return 0.5 * (sim_s + sim_g)

    return fused_sim


def _pad_triplets(idx: List[int], margins: List[float], counts, tri_cap: int):
    """[a,p,n,...] flat list -> fixed arrays: gather index [3*tri_cap],
    per-group masks [tri_cap], margins [tri_cap]."""
    triplet_count, hard_count, struct_count = counts
    total = triplet_count + hard_count + struct_count
    total = min(total, tri_cap)
    gather = np.zeros(3 * tri_cap, np.int32)
    flat = np.asarray(idx[: 3 * total], np.int32).reshape(-1, 3)
    gather[: 3 * total] = flat.reshape(-1)
    m_lab = np.zeros(tri_cap, np.float32)
    m_hard = np.zeros(tri_cap, np.float32)
    m_struct = np.zeros(tri_cap, np.float32)
    marg = np.zeros(tri_cap, np.float32)
    m_lab[: min(triplet_count, total)] = 1.0
    h_end = min(triplet_count + hard_count, total)
    m_hard[min(triplet_count, total): h_end] = 1.0
    s_end = min(total, tri_cap)
    m_struct[h_end: s_end] = 1.0
    marg[h_end: s_end] = np.asarray(margins[: s_end - h_end], np.float32)
    return gather, m_lab, m_hard, m_struct, marg


def train(cfg: TrainConfig, hard_only: bool = False,
          device_mining: bool = False,
          event_budget: Optional[int] = None,
          result_dir: Optional[str] = None):
    """device_mining=True runs the FULLY-FUSED flagship step: labeled
    semi-hard mining, PDDM pseudo-similarity, and hard+structure mining
    all inside one jitted program per batch (make_mm_fused_step) — zero
    host round trips.  The default path keeps the reference's exact
    host-side sequential mining semantics."""
    # (int8 x bf16 exclusion is validated in TrainConfig.resolve)
    if cfg.int8_features and not device_mining:
        raise ValueError("--int8_features requires --device_mining "
                         "(the device-fed path); host miners slice "
                         "raw numpy features")
    modalities = cfg.feat if isinstance(cfg.feat, list) else \
        ["resnet", "sensors", "segment"]
    # multihost (pod) flagship: jax.distributed bootstrap, sessions sharded
    # across hosts, per-host loaders feeding globally-sharded batches into
    # the fused dp step (labels/mask fed host-local and gathered on device).
    # Only process 0 writes checkpoints / dist_dict / projector artifacts.
    pid, pcount = 0, 1
    if cfg.multihost:
        if not device_mining:
            raise NotImplementedError(
                "--multihost requires --device_mining (the fused step; "
                "host miners are single-process)")
        import dataclasses

        from multimodal_similarity_tpu.parallel.multihost import (
            initialize_distributed)
        initialize_distributed(
            cfg.coordinator_address or None,
            cfg.num_processes or None,
            cfg.process_id if cfg.process_id >= 0 else None)
        pid, pcount = jax.process_index(), jax.process_count()
        if pid > 0:
            # per-host result scratch: process 0 owns the real artifacts
            cfg = dataclasses.replace(cfg, name=f"{cfg.name}_proc{pid}")
            if result_dir is not None:
                result_dir = f"{result_dir}_proc{pid}"
    # flagship data parallelism: with >1 visible device and device mining,
    # run the fused step over a 1-D "data" mesh (event budget rounded up to
    # a device multiple — batches are fixed-shape + mask-padded anyway)
    mesh = None
    if device_mining:
        if cfg.model_parallel > 1:
            # dp x tp mesh: event batch on "data", the core encoder's wide
            # weight-matrix columns on "model" (state sharded below).
            # Composes with --multihost: tp groups stay within a host,
            # the data axis aligns to processes
            from multimodal_similarity_tpu.parallel import auto_mesh_tp
            mesh, event_budget = auto_mesh_tp(
                event_budget or cfg.event_per_batch, cfg.model_parallel,
                verbose=not cfg.silent_mode)
        else:
            from multimodal_similarity_tpu.parallel import auto_mesh
            mesh, rounded = auto_mesh(event_budget or cfg.event_per_batch,
                                      verbose=not cfg.silent_mode)
            if mesh is not None:
                event_budget = rounded
    elif cfg.model_parallel > 1:
        raise ValueError("--model_parallel requires --device_mining "
                         "(the fused jitted step)")
    if cfg.multihost and mesh is None:
        raise RuntimeError("--multihost needs >= 2 devices across processes")
    exp = HondaExperiment(cfg, modalities=modalities,
                          supports_int8=device_mining,
                          event_budget=(event_budget or cfg.event_per_batch)
                          // pcount if pcount > 1 else event_budget,
                          result_dir=result_dir,
                          limit_label_num=(cfg.task == "supervised"),
                          session_shard=(pid, pcount) if pcount > 1
                          else None)
    from multimodal_similarity_tpu.train.trainer import feature_caster
    _cast = feature_caster(cfg)
    core, sensors_enc, sensors_pddm, segment_enc, segment_pddm = \
        build_models(cfg, sensors_dim=exp.val_extra[0].shape[-1],
                     segment_dim=exp.val_extra[1].shape[-1])

    x0 = jnp.asarray(np.zeros((2,) + exp.val_feats.shape[1:], np.float32))
    s0 = jnp.asarray(np.zeros((2,) + exp.val_extra[0].shape[1:], np.float32))
    g0 = jnp.asarray(np.zeros((2,) + exp.val_extra[1].shape[1:], np.float32))
    e32 = jnp.zeros((2, SENSORS_EMB_DIM), jnp.float32)

    params = {
        "modality_core": core.init(exp.next_key(), x0)["params"],
        "modality_sensors": {
            "encoder": sensors_enc.init(exp.next_key(), s0)["params"],
            "pddm": sensors_pddm.init(exp.next_key(), e32, e32,
                                      method="score")["params"],
        },
        "modality_segment": {
            "encoder": segment_enc.init(exp.next_key(), g0)["params"],
            "pddm": segment_pddm.init(exp.next_key(), e32, e32,
                                      method="score")["params"],
        },
    }

    # restore pretrained PDDM branches (reference :376-379)
    for scope, path in (("modality_sensors", cfg.sensors_path),
                        ("modality_segment", cfg.segment_path)):
        if path:
            ckpt_state = load_pytree(path, None)
            branch = ckpt_state.get("params", ckpt_state)
            params[scope] = _graft(params[scope], branch)

    # frozen RTSN towers unless no_joint (reference :285-290)
    if cfg.no_joint:
        frozen = ("modality_sensors", "modality_segment")
    else:
        frozen = ("modality_sensors/encoder", "modality_segment/encoder")
    state = TrainState.create(params, build_optimizer(
        cfg.optimizer, cfg.learning_rate, frozen_scopes=frozen))
    if cfg.model_path:
        state = load_pytree(cfg.model_path, state)
    if mesh is not None:
        if cfg.model_parallel > 1:
            from multimodal_similarity_tpu.parallel import (
                shard_state_tp, tp_sharded_leaves)
            sharded = tp_sharded_leaves(state.params, mesh)
            if not sharded:
                raise ValueError(
                    f"--model_parallel {cfg.model_parallel}: no parameter "
                    f"has a trailing dim divisible by "
                    f"{cfg.model_parallel}; tensor parallelism would be "
                    "a silent no-op")
            state = shard_state_tp(state, mesh)
        elif pcount == 1:
            state = jax.device_put(state, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec()))
        # multihost: the state stays an uncommitted host-local value
        # (identical on every process, same seed); jit replicates it —
        # device_put cannot address other hosts' devices
        if not cfg.silent_mode:
            print(f"[{cfg.name}] data-parallel fused step over "
                  f"{mesh.shape['data']} devices"
                  + (f" x {cfg.model_parallel} model-parallel"
                     if cfg.model_parallel > 1 else "")
                  + (f" on {pcount} hosts" if pcount > 1 else ""))

    embed_fn = make_embed_fn(core, cfg.normalized)
    tri_cap = cfg.triplet_per_batch * 2
    step_fn = make_mm_train_step(core, cfg, tri_cap)
    fused_sim = make_fused_sim_fn(sensors_enc, sensors_pddm, segment_enc,
                                  segment_pddm, cfg)
    if device_mining:
        fused_step = make_mm_fused_step(core, sensors_enc, sensors_pddm,
                                        segment_enc, segment_pddm, cfg,
                                        mesh=mesh, hard_only=hard_only,
                                        gather_smalls=pcount > 1)

    def core_embed(params, feats):
        from multimodal_similarity_tpu.train.steps import embed_in_chunks
        return embed_in_chunks(lambda p, x: embed_fn(p, x),
                               params["modality_core"], feats,
                               beat=exp.beat_fn)

    val_emb = core_embed(state.params, cached_device(exp.val_feats))
    dist_dict = init_dist_dict(val_emb, exp.val_labels, cfg.metric)

    # fused path: ship events/aux-modalities/labels/mask to the device on a
    # background thread one batch ahead (bf16-cast host-side when asked),
    # overlapping the dominant feature upload with the previous fused step.
    # The stream is continuous across epochs (same design as base_model):
    # the boundary validation/dist_dict/checkpoint work overlaps the next
    # epoch's pipeline fill; the epoch loop slices batch_per_epoch batches
    # per epoch and the stream is closed on exit.
    # --device_cache (requires --device_mining): all three modalities'
    # windows upload once as int8; per-epoch TSN re-sampling is a
    # shard-local on-device gather (data/device_cache.py), so from epoch 2
    # the link carries only the index/label/mask plan
    cache = None
    if cfg.device_cache:
        if not device_mining:
            raise ValueError("--device_cache requires --device_mining "
                             "(the fused device-fed step)")
        if cfg.bf16_features:
            raise ValueError("--device_cache stores int8; it excludes "
                             "--bf16_features")
        from multimodal_similarity_tpu.data.device_cache import (
            DeviceFeatureCache, cache_budget_bytes)
        # --multihost: exp.train_set is the FULL session list — the cache
        # round-robins sessions over the global mesh's "data" shards
        # (replacing host_local_sessions' host split) and each process
        # loads + uploads only its own shards' features; plans/labels/
        # step counts stay identical on every host (lockstep preserved)
        cache = DeviceFeatureCache.build(
            exp.train_set, n_seg=cfg.num_seg,
            sess_per_batch=cfg.sess_per_batch,
            event_budget=event_budget or cfg.event_per_batch, seed=cfg.seed,
            mesh=mesh, budget_bytes=cache_budget_bytes(cfg.device_cache_gb),
            beat=exp.beat_fn,  # a step-sized watchdog must survive the
            verbose=not cfg.silent_mode)  # one-time multi-GB build
        if cache is not None:
            exp.batch_per_epoch = cache.batches_per_epoch
            # single-dispatch path: rebuild the fused step with the TSN
            # gather INSIDE it; a batch costs one packed KB-scale upload
            fused_step = make_mm_fused_step(
                core, sensors_enc, sensors_pddm, segment_enc, segment_pddm,
                cfg, mesh=mesh, hard_only=hard_only, cache=cache)
            cache_ops = cache.step_operands()
            multi_fused = None
            if cfg.steps_per_dispatch > 1:
                # --steps_per_dispatch: K whole optimizer steps per
                # program; full windows ride multi_fused, the epoch-tail
                # remainder the K=1 fused step
                multi_fused = make_mm_fused_step(
                    core, sensors_enc, sensors_pddm, segment_enc,
                    segment_pddm, cfg, mesh=mesh, hard_only=hard_only,
                    cache=cache,
                    steps_per_dispatch=cfg.steps_per_dispatch)
                from multimodal_similarity_tpu.data.device_cache import (
                    notice_window_shortfall)
                notice_window_shortfall(cache, cfg.steps_per_dispatch,
                                        cfg.name, cfg.silent_mode)

    def continuous_batches():
        def epochs():
            while True:
                produced = 0
                # lockstep truncation (pcount > 1) at the PRODUCER: a host
                # holding extra sessions must not carry surplus batches
                # into the next epoch; truncated inside the loader so its
                # rng consumption stays deterministic
                batches = exp.loader.epoch(
                    max_batches=exp.batch_per_epoch if pcount > 1 else None)
                for b in batches:
                    produced += 1
                    yield b
                if not produced:  # empty epoch: let the consumer stop
                    return

        if cache is not None:
            # device-resident cache: host side carries only the packed
            # index plan; the fused step gathers + trains in one program
            def cached_epochs():
                while True:
                    yield from cache.epoch_plans()
            return cached_epochs()
        if not device_mining:
            return epochs()  # host miners slice numpy arrays
        from multimodal_similarity_tpu.data import (
            device_prefetch, feed_shardings)
        shardings = None
        if mesh is not None and pcount > 1:
            # each host feeds only its local rows of every tensor; the
            # fused step gathers labels/mask for the global mining passes
            shardings = feed_shardings(
                mesh, data_keys=("events", "events2", "events3",
                                 "labels", "mask"),
                replicated_keys=())
        elif mesh is not None:
            shardings = feed_shardings(mesh)
        return device_prefetch(
            epochs(),
            device_keys=("events", "events2", "events3", "labels", "mask"),
            bf16_keys=("events",) if cfg.bf16_features else (),
            int8_keys=("events",) if cfg.int8_features else (),
            shardings=shardings)

    metrics = {}
    # config-seeded host-miner streams: facenet uses a random.Random, the
    # mul selectors a RandomState — independent of process-global RNG state
    mine_rng = random.Random(cfg.seed)
    mul_rng = np.random.RandomState(cfg.seed)
    # host-side step counter: the loop never calls int(state.step) per
    # step (that blocks on the whole step result and serializes dispatch)
    step_host = int(state.step)
    epoch = epoch_of_step(step_host, exp.batch_per_epoch)
    # --profile_dir tracing is owned by exp.profiler (updated in exp.log)
    import itertools
    from multimodal_similarity_tpu.utils.preemption import (
        report_preemption, sync_should_stop)
    stream = continuous_batches()
    guard = exp._guard  # installed by HondaExperiment, restored in close()
    stopping = False
    try:
        while epoch < cfg.max_epochs:
            lr = learning_rate_schedule(epoch, cfg.learning_rate,
                                        cfg.static_epochs, cfg.max_epochs,
                                        decay_base=0.01)
            step_at_epoch_start = step_host
            if device_mining:
                # per-epoch constants of the fused step, hoisted out of
                # the batch loop (dist_dict only changes at validation).
                # Size the margin table by the full label dictionary, not
                # just the classes seen in validation: under jit an
                # out-of-range label would clamp to the last index and
                # silently borrow another class's margin (the host path
                # raises KeyError for the same input).
                from multimodal_similarity_tpu.data import LABEL_TRANSFER
                # training batches always carry transferred labels
                # (SessionBatchLoader default), whose space is the
                # LABEL_TRANSFER range
                label_space = max(LABEL_TRANSFER.values())
                n_classes = max(max(dist_dict.keys()), label_space) + 1
                cm = jnp.asarray([dist_dict.get(c, [0.0])[-1]
                                  for c in range(n_classes)], jnp.float32)
                use_mm = jnp.float32(
                    1.0 if epoch >= cfg.multimodal_epochs else 0.0)
            batch_iter = itertools.islice(stream, exp.batch_per_epoch)
            if device_mining and cache is not None \
                    and cfg.steps_per_dispatch > 1:
                # windowed multi-step dispatch: K stacked KB-scale plans,
                # ONE program invocation per K optimizer steps; the
                # epoch-tail remainder rides the K=1 fused step.  Stop
                # polling coarsens to window boundaries (--help note).
                from multimodal_similarity_tpu.train.cached_steps import (
                    dispatch_plan_window)
                K = cfg.steps_per_dispatch
                for win in iter(
                        lambda: list(itertools.islice(batch_iter, K)), []):
                    state, aux_list = dispatch_plan_window(
                        state, win, [exp.next_key() for _ in win], lr,
                        fused=fused_step, multi=multi_fused, k=K,
                        plan_args=lambda p: (p["packed"],),
                        extra_args=(cm, use_mm), cache_ops=cache_ops,
                        put_plans=cache.put_plans)
                    for aux in aux_list:
                        step_host += 1
                        exp.log_deferred(
                            step_host, aux, {"learning_rate": lr},
                            echo_fn=lambda sc, e=epoch, s=step_host: (
                                f"[{cfg.name}] epoch {e + 1} step {s} "
                                f"loss {sc['loss']:.4f} tri/hard/struct "
                                f"{sc['triplet_count']:.0f}/"
                                f"{sc['hard_count']:.0f}/"
                                f"{sc['struct_count']:.0f}"))
                    stopping = sync_should_stop(guard, pcount,
                                                step=step_host)
                    if stopping:
                        break
                batch_iter = iter(())  # fully consumed (or stopped) above
            for batch in batch_iter:
                if device_mining:
                    if cache is not None:
                        # fused gather+train: one program, one packed
                        # upload (put_plans: global plan under --multihost)
                        state, aux = fused_step(
                            state, *cache.put_plans((batch["packed"],)),
                            cm, use_mm, exp.next_key(), jnp.float32(lr),
                            *cache_ops)
                    else:
                        # batch tensors arrive device-resident from the
                        # prefetch thread (bf16-cast host-side when
                        # --bf16_features)
                        state, aux = fused_step(
                            state, batch["events"], batch["events2"],
                            batch["events3"], batch["labels"], batch["mask"],
                            cm, use_mm, exp.next_key(), jnp.float32(lr))
                    step_host += 1
                    exp.log_deferred(
                        step_host, aux, {"learning_rate": lr},
                        echo_fn=lambda sc, e=epoch, s=step_host: (
                            f"[{cfg.name}] epoch {e + 1} step {s} "
                            f"loss {sc['loss']:.4f} tri/hard/struct "
                            f"{sc['triplet_count']:.0f}/"
                            f"{sc['hard_count']:.0f}/"
                            f"{sc['struct_count']:.0f}"))
                    # the fused path is the only --multihost path: it must
                    # hit the same collective stop poll as the host path
                    stopping = sync_should_stop(guard, pcount,
                                                step=step_host)
                    if stopping:
                        break
                    continue
                n = int(batch["num_events"])
                emb = core_embed(state.params, batch["events"][:n])
                dists = cdist(all_diffs(emb, emb), cfg.metric)
                idx, active_count = select_triplets_facenet(
                    batch["labels"][:n], np.asarray(dists),
                    cfg.triplet_per_batch, cfg.alpha, cfg.num_negative,
                    rng=mine_rng)
                if not idx:
                    continue
                triplet_count = len(idx) // 3
                hard_count = struct_count = 0
                margins: List[float] = []
                if epoch >= cfg.multimodal_epochs:
                    sim = np.array(fused_sim(
                        state.params, jnp.asarray(batch["events2"]),
                        jnp.asarray(batch["events3"])))[:n, :n]
                    np.fill_diagonal(sim, np.nan)
                    if hard_only:
                        idx, triplet_count, hard_count = \
                            select_triplets_mul_hard(
                                idx, batch["labels"][:n].reshape(-1, 1), sim,
                                cfg.triplet_per_batch, 3, 0.8, 0.2,
                                rng=mul_rng)
                        margins, struct_count = [], 0
                    else:
                        idx, margins, triplet_count, hard_count, struct_count = \
                            select_triplets_mul(
                                idx, batch["labels"][:n], sim, dist_dict,
                                cfg.triplet_per_batch, 3, 0.8, 0.2,
                                rng=mul_rng)

                gather, m_lab, m_hard, m_struct, marg = _pad_triplets(
                    idx, margins,
                    (triplet_count, hard_count, struct_count), tri_cap)
                tri_events = jnp.asarray(_cast(batch["events"][:n][gather]))
                state, aux = step_fn(state, tri_events, jnp.asarray(m_lab),
                                     jnp.asarray(m_hard), jnp.asarray(m_struct),
                                     jnp.asarray(marg), exp.next_key(),
                                     jnp.float32(lr))
                step_host += 1
                exp.log(step_host,
                        {**{k: float(v) for k, v in aux.items()},
                         "active_count": active_count,
                         "triplet_count": triplet_count,
                         "hard_count": hard_count,
                         "struct_count": struct_count, "learning_rate": lr},
                        f"[{cfg.name}] epoch {epoch + 1} step {step_host} "
                        f"loss {float(aux['loss']):.4f} "
                        f"tri/hard/struct {triplet_count}/{hard_count}/"
                        f"{struct_count}")
                # collective: a SIGTERM on ANY host stops every host at
                # this same step boundary (a lone exiter would leave its
                # peers blocked in the next collective)
                stopping = sync_should_stop(guard, pcount,
                                            step=step_host)
                if stopping:
                    break

            exp.flush_logs()  # epoch boundary: sync queued step metrics
            # epoch boundary: force a sync so a signal near epoch end
            # isn't deferred into the next epoch by the step throttle
            stopping = stopping or sync_should_stop(guard, pcount)
            if stopping:
                # preemption (SIGTERM grace window): checkpoint the exact
                # step and exit cleanly; --model_path resumes from here
                report_preemption(cfg.name, state, exp.ckpt, pid)
                break
            if step_host == step_at_epoch_start:
                print(f"[{cfg.name}] epoch {epoch + 1}: no trainable batch; stopping")
                break
            val_params = state.params
            if pcount > 1:
                # replicated global arrays -> host-local values for the
                # (host-side, redundant-per-host) validation pass
                val_params = jax.tree.map(
                    lambda a: np.asarray(jax.device_get(a)), state.params)
            val_emb = core_embed(val_params, cached_device(exp.val_feats))
            from multimodal_similarity_tpu.eval.metrics import (
                retrieval_metrics_device)
            mAP, mPrec, recalls = retrieval_metrics_device(
                val_emb, exp.val_labels.reshape(-1))
            metrics = {"val_mAP": mAP, "val_mPrec": mPrec,
                       "val_recall@1": recalls[1]}
            exp.log(step_host, metrics,
                    f"[{cfg.name}] epoch {epoch + 1} val mAP {mAP:.4f}")

            # dist_dict update cadence (reference :566-573)
            if (epoch + 1) == 50 or (epoch + 1) % 200 == 0:
                for i in dist_dict:
                    temp = val_emb[np.where(exp.val_labels.reshape(-1) == i)[0]]
                    dist_dict[i].append(float(np.mean(cdist(all_diffs(
                        jnp.asarray(temp), jnp.asarray(temp)), cfg.metric)))
                        if temp.shape[0] else 0.0)
                if pid == 0:
                    with open(os.path.join(exp.result_dir, "dist_dict.pkl"),
                              "wb") as f:
                        pickle.dump(dist_dict, f)

            if pid == 0:
                exp.ckpt.save_async(state, step_host)
            epoch = epoch_of_step(step_host, exp.batch_per_epoch)

    finally:
        # cancel the prefetch worker (it runs one batch ahead)
        # and flush any open trace/logs even when a step raises
        stream.close()
        exp.close()
    return state, metrics, exp.result_dir


def select_triplets_mul_hard(triplet_input_idx, lab, sim_prob,
                             triplet_per_batch, triplet_per_event=2,
                             threshold_up=0.65, threshold_down=0.35,
                             rng=None):
    """Hard-mining-only ablation (multimodal_model_hardonly.py:71-126):
    select_triplets_mul without the structure term."""
    flat, _, triplet_count, hard_count, _ = select_triplets_mul(
        triplet_input_idx, lab, sim_prob, {}, triplet_per_batch,
        triplet_per_event, threshold_up, threshold_down, rng=rng,
        mine_struct=False)
    return flat, triplet_count, hard_count


def _graft(template, branch):
    """Copy matching keys of ``branch`` over ``template`` (scope-stripped
    restore, reference :200-217)."""
    if not isinstance(template, dict):
        return branch
    out = dict(template)
    for k in template:
        if isinstance(branch, dict) and k in branch:
            out[k] = _graft(template[k], branch[k])
    return out


def main(argv=None):
    cfg = TrainConfig.parse(argv)
    train(cfg, device_mining=cfg.device_mining)


if __name__ == "__main__":
    main(sys.argv[1:])
