"""TF1 reference-checkpoint import (utils/tf1_import.py, tools/import_tf1.py).

Two tiers:
- NumPy-oracle equivalence (fast, no TensorFlow): build TF1-layout variable
  dicts, run a hand-written NumPy forward implementing the REFERENCE
  semantics (networks.py math: xw_plus_b, LSTMCell with fused (i,j,f,o)
  kernel + runtime forget_bias, biasless 1x1 conv), and assert the flax
  model with imported params produces the same outputs.
- A genuine name-based TF1 ``.ckpt`` written via ``tf.compat.v1`` Saver in
  a subprocess (slow), imported through the CLI end to end.
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_similarity_tpu.models import encoders, heads
from multimodal_similarity_tpu.train.checkpoints import load_pytree
from multimodal_similarity_tpu.utils.tf1_import import (
    convert_tf1_variables, read_tf1_checkpoint)

rng = np.random.RandomState(0)


def _lstm_numpy(x, kernel, bias, forget_bias=1.0):
    """tf.contrib.rnn.LSTMCell over [B, T, D]: fused [x; h] @ kernel with
    gate order (i, j, f, o), +forget_bias on f at runtime."""
    b, t, _ = x.shape
    units = kernel.shape[1] // 4
    c = np.zeros((b, units)); h = np.zeros((b, units))
    sig = lambda a: 1.0 / (1.0 + np.exp(-a))
    outs = []
    for step in range(t):
        gates = np.concatenate([x[:, step], h], axis=-1) @ kernel + bias
        i, j, f, o = np.split(gates, 4, axis=-1)
        c = sig(f + forget_bias) * c + sig(i) * np.tanh(j)
        h = sig(o) * np.tanh(c)
        outs.append(h)
    return np.stack(outs, axis=1), (c, h)


def test_rtsn_import_matches_reference_numpy():
    n_in, emb, n_seg, b = 6, 10, 3, 4
    variables = {
        "RTSN/W_1": rng.randn(n_in, emb).astype(np.float32),
        "RTSN/b_1": rng.randn(emb).astype(np.float32),
        # the alternative rnn-scoped TF1 naming — exercises suffix matching
        "RTSN/rnn/lstm_cell/kernel":
            (0.3 * rng.randn(2 * emb, 4 * emb)).astype(np.float32),
        "RTSN/rnn/lstm_cell/bias": rng.randn(4 * emb).astype(np.float32),
        # optimizer slots must be ignored by name resolution
        "RTSN/W_1/Adam": np.zeros((n_in, emb), np.float32),
    }
    x = rng.randn(b, n_seg, n_in).astype(np.float32)

    # reference semantics in NumPy (networks.py:383-422)
    h = np.maximum(x.reshape(-1, n_in) @ variables["RTSN/W_1"]
                   + variables["RTSN/b_1"], 0.0).reshape(b, n_seg, emb)
    outs, _ = _lstm_numpy(h, variables["RTSN/rnn/lstm_cell/kernel"],
                          variables["RTSN/rnn/lstm_cell/bias"])
    want = outs[:, -1]

    model = encoders.RTSN(n_seg=n_seg, emb_dim=emb, n_input=n_in)
    template = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = convert_tf1_variables("rtsn", variables, template)
    got = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_convtsn_import_matches_reference_numpy():
    n_in, n_c, n_h, n_w, emb, n_seg, b = 5, 4, 2, 3, 8, 3, 2
    variables = {
        "W_emb": rng.randn(1, 1, n_in, n_c).astype(np.float32),
        "W": rng.randn(n_h * n_w * n_c, emb).astype(np.float32),
        "b": rng.randn(emb).astype(np.float32),
    }
    x = rng.randn(b, n_seg, n_h, n_w, n_in).astype(np.float32)

    # networks.py:611-654: biasless 1x1 conv + relu, flatten (h, w, C), fc,
    # mean over segments
    e = np.maximum(x @ variables["W_emb"].reshape(n_in, n_c), 0.0)
    e = e.reshape(b, n_seg, n_h * n_w * n_c)
    want = (e @ variables["W"] + variables["b"]).mean(axis=1)

    model = encoders.ConvTSN(n_seg=n_seg, n_C=n_c, emb_dim=emb,
                             n_input=n_in, n_h=n_h, n_w=n_w)
    template = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = convert_tf1_variables("convtsn", variables, template)
    got = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_convbirtsn_import_matches_reference_numpy():
    n_in, n_c, n_h, n_w, emb, n_seg, b = 4, 3, 2, 2, 8, 3, 2
    half = emb // 2
    variables = {
        "ConvBiRTSN/W_emb": rng.randn(1, 1, n_in, n_c).astype(np.float32),
        "ConvBiRTSN/fw/lstm_cell/kernel":
            (0.3 * rng.randn(n_h * n_w * n_c + half, 4 * half)
             ).astype(np.float32),
        "ConvBiRTSN/fw/lstm_cell/bias":
            rng.randn(4 * half).astype(np.float32),
        "ConvBiRTSN/bw/lstm_cell/kernel":
            (0.3 * rng.randn(n_h * n_w * n_c + half, 4 * half)
             ).astype(np.float32),
        "ConvBiRTSN/bw/lstm_cell/bias":
            rng.randn(4 * half).astype(np.float32),
    }
    x = rng.randn(b, n_seg, n_h, n_w, n_in).astype(np.float32)

    e = np.maximum(
        x @ variables["ConvBiRTSN/W_emb"].reshape(n_in, n_c), 0.0)
    e = e.reshape(b, n_seg, -1)
    fw, _ = _lstm_numpy(e, variables["ConvBiRTSN/fw/lstm_cell/kernel"],
                        variables["ConvBiRTSN/fw/lstm_cell/bias"])
    bw, _ = _lstm_numpy(e[:, ::-1], variables["ConvBiRTSN/bw/lstm_cell/kernel"],
                        variables["ConvBiRTSN/bw/lstm_cell/bias"])
    want = np.concatenate([fw, bw[:, ::-1]], axis=-1)[:, -1]

    model = encoders.ConvBiRTSN(n_seg=n_seg, n_C=n_c, emb_dim=emb,
                                n_input=n_in, n_h=n_h, n_w=n_w)
    template = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = convert_tf1_variables("convbirtsn", variables, template)
    got = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_pddm_import_matches_reference_numpy():
    n, b = 7, 5
    variables = {f"PDDM/{k}": v for k, v in {
        "W_u": rng.randn(n, n).astype(np.float32),
        "b_u": rng.randn(n).astype(np.float32),
        "W_v": rng.randn(n, n).astype(np.float32),
        "b_v": rng.randn(n).astype(np.float32),
        "W_c": rng.randn(2 * n, n).astype(np.float32),
        "b_c": rng.randn(n).astype(np.float32),
        "W_s": rng.randn(n, 2).astype(np.float32),
        "b_s": rng.randn(2).astype(np.float32),
    }.items()}
    a = rng.randn(b, n).astype(np.float32)
    c = rng.randn(b, n).astype(np.float32)

    def l2n(x, eps=1e-10):
        sq = np.sum(np.square(x), axis=-1, keepdims=True)
        return x / np.sqrt(np.maximum(sq, eps))

    u = np.abs(a - c); v = 0.5 * (a + c)
    uu = l2n(np.maximum(u @ variables["PDDM/W_u"] + variables["PDDM/b_u"], 0))
    vv = l2n(np.maximum(v @ variables["PDDM/W_v"] + variables["PDDM/b_v"], 0))
    cc = np.maximum(np.concatenate([uu, vv], -1) @ variables["PDDM/W_c"]
                    + variables["PDDM/b_c"], 0)
    want = cc @ variables["PDDM/W_s"] + variables["PDDM/b_s"]

    model = heads.PDDM(n_input=n)
    template = model.init(jax.random.PRNGKey(0), jnp.asarray(a),
                          jnp.asarray(c), method="score")["params"]
    params = convert_tf1_variables("pddm", variables, template)
    logits, _ = model.apply({"params": params}, jnp.asarray(a),
                            jnp.asarray(c), method="score")
    np.testing.assert_allclose(np.asarray(logits), want, atol=2e-5)


def test_coverage_and_shape_errors_are_loud():
    n_in, emb = 6, 10
    model = encoders.TSN(n_seg=3, emb_dim=emb, n_input=n_in)
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 3, n_in)))["params"]
    good = {
        "W_1": np.zeros((n_in, emb), np.float32),
        "b_1": np.zeros((emb,), np.float32),
        "W_2": np.zeros((emb, emb), np.float32),
        "b_2": np.zeros((emb,), np.float32),
    }
    convert_tf1_variables("tsn", good, template)  # sanity: total coverage
    with pytest.raises(KeyError, match="no checkpoint variable"):
        convert_tf1_variables("tsn", {k: v for k, v in good.items()
                                      if k != "W_2"}, template)
    bad = dict(good, W_2=np.zeros((emb, emb + 1), np.float32))
    with pytest.raises(ValueError, match="shape mismatch"):
        convert_tf1_variables("tsn", bad, template)
    two = dict(good)
    two["scope_a/W_2"] = good["W_2"]; del two["W_2"]
    two["scope_b/W_2"] = good["W_2"]
    with pytest.raises(KeyError, match="ambiguous"):
        convert_tf1_variables("tsn", two, template)


def test_cli_import_from_npz(tmp_path):
    """CLI end to end on an .npz (the no-TensorFlow path), dims inferred."""
    from multimodal_similarity_tpu.tools import import_tf1 as cli
    n_in, n_c, n_h, n_w, emb = 5, 4, 2, 3, 8
    npz = str(tmp_path / "ref.npz")
    np.savez(npz,
             **{"ConvRTSN/W_emb": rng.randn(1, 1, n_in, n_c)
                .astype(np.float32),
                "ConvRTSN/lstm_cell/kernel":
                    (0.3 * rng.randn(n_h * n_w * n_c + emb, 4 * emb)
                     ).astype(np.float32),
                "ConvRTSN/lstm_cell/bias":
                    rng.randn(4 * emb).astype(np.float32)})
    out = str(tmp_path / "params.msgpack")
    cli.main(["--ckpt", npz, "--model", "convrtsn", "--output", out,
              "--n_h", str(n_h), "--n_w", str(n_w)])
    ckpt = load_pytree(out, None)
    params = ckpt["params"]
    model = encoders.ConvRTSN(n_seg=3, n_C=n_c, emb_dim=emb, n_input=n_in,
                              n_h=n_h, n_w=n_w)
    x = jnp.asarray(rng.randn(2, 3, n_h, n_w, n_in).astype(np.float32))
    got = model.apply({"params": params}, x)
    assert got.shape == (2, emb) and np.all(np.isfinite(np.asarray(got)))


def test_cli_scope_selects_flagship_branch(tmp_path):
    """--scope on a flagship-style two-branch checkpoint: the reference
    saves modality_sensors/RTSN/... AND modality_segment/RTSN/... in one
    file (multimodal_model.py:178-217), so every suffix is ambiguous
    without it; --scope filters + strips the prefix (ADVICE r4)."""
    from multimodal_similarity_tpu.tools import import_tf1 as cli
    n_in, emb = 5, 8
    r = np.random.RandomState(3)
    f = lambda *s: r.randn(*s).astype(np.float32)  # noqa: E731
    branch = lambda scope: {  # noqa: E731
        f"{scope}/RTSN/W_1": f(n_in, emb),
        f"{scope}/RTSN/b_1": f(emb),
        f"{scope}/RTSN/lstm_cell/kernel": f(2 * emb, 4 * emb),
        f"{scope}/RTSN/lstm_cell/bias": f(4 * emb)}
    npz = str(tmp_path / "flagship.npz")
    np.savez(npz, **branch("modality_sensors"), **branch("modality_segment"))
    out = str(tmp_path / "sensors.msgpack")

    # without --scope: the ambiguity is loud, naming both candidates
    with pytest.raises(KeyError, match="ambiguous"):
        cli.main(["--ckpt", npz, "--model", "rtsn", "--output", out])

    cli.main(["--ckpt", npz, "--model", "rtsn", "--output", out,
              "--scope", "modality_sensors"])
    params = load_pytree(out, None)["params"]
    model = encoders.RTSN(n_seg=3, emb_dim=emb, n_input=n_in)
    x = jnp.asarray(np.random.RandomState(4)
                    .randn(2, 3, n_in).astype(np.float32))
    got = model.apply({"params": params}, x)
    assert got.shape == (2, emb) and np.all(np.isfinite(np.asarray(got)))

    # a scope matching nothing dies loudly, listing what IS there
    with pytest.raises(SystemExit):
        cli.main(["--ckpt", npz, "--model", "rtsn", "--output", out,
                  "--scope", "modality_nope"])


def test_all_reference_optimizer_slots_dropped(tmp_path):
    """read_tf1_checkpoint drops slot variables for EVERY optimizer the
    reference factory offers (utils.py:12-15: ADAM/ADADELTA/ADAGRAD/
    MOMENTUM/SGD) — Adadelta/Adagrad were missing (ADVICE r4), polluting
    --print_vars and the 'available:' error listings."""
    from multimodal_similarity_tpu.utils.tf1_import import (
        read_tf1_checkpoint)
    npz = str(tmp_path / "slots.npz")
    w = np.ones((2, 2), np.float32)
    np.savez(npz, **{
        "W_1": w, "b_1": np.ones(2, np.float32),
        "W_1/Adam": w, "W_1/Adam_1": w,
        "W_1/Adadelta": w, "W_1/Adadelta_1": w,
        "W_1/Adagrad": w,
        "W_1/Momentum": w, "W_1/RMSProp": w,
        "beta1_power": np.float32(0.9), "global_step": np.int64(7)})
    got = read_tf1_checkpoint(npz)
    assert sorted(got) == ["W_1", "b_1"], sorted(got)


def _variables_for(model):
    """TF1-layout variables (reference shapes) for each supported model."""
    n_in, emb, n_c, n_h, n_w = 5, 8, 4, 2, 3
    hwc = n_h * n_w * n_c
    r = np.random.RandomState(1)
    f = lambda *s: r.randn(*s).astype(np.float32)
    if model in ("tsn",):
        return {"W_1": f(n_in, emb), "b_1": f(emb),
                "W_2": f(emb, emb), "b_2": f(emb)}
    if model == "rtsn":
        return {"RTSN/W_1": f(n_in, emb), "RTSN/b_1": f(emb),
                "RTSN/lstm_cell/kernel": f(2 * emb, 4 * emb),
                "RTSN/lstm_cell/bias": f(4 * emb)}
    if model == "convtsn":
        return {"W_emb": f(1, 1, n_in, n_c), "W": f(hwc, emb), "b": f(emb)}
    if model == "convtsnclassifier":
        return {"W_emb": f(1, 1, n_in, n_c), "W": f(hwc, emb),
                "b": f(emb), "W_o": f(emb, 11), "b_o": f(11)}
    if model == "convrtsn":
        return {"ConvRTSN/W_emb": f(1, 1, n_in, n_c),
                "ConvRTSN/lstm_cell/kernel": f(hwc + emb, 4 * emb),
                "ConvRTSN/lstm_cell/bias": f(4 * emb)}
    if model == "convbirtsn":
        h = emb // 2
        return {"ConvBiRTSN/W_emb": f(1, 1, n_in, n_c),
                "ConvBiRTSN/fw/lstm_cell/kernel": f(hwc + h, 4 * h),
                "ConvBiRTSN/fw/lstm_cell/bias": f(4 * h),
                "ConvBiRTSN/bw/lstm_cell/kernel": f(hwc + h, 4 * h),
                "ConvBiRTSN/bw/lstm_cell/bias": f(4 * h)}
    if model == "convlstm":
        return {"ConvLSTM/W_emb": f(1, 1, n_in, n_c),
                "ConvLSTM/lstm_cell/kernel": f(hwc + emb, 4 * emb),
                "ConvLSTM/lstm_cell/bias": f(4 * emb)}
    if model == "sae":
        return {"W_1": f(n_in, emb), "b_1": f(emb), "W_2": f(emb, emb),
                "b_2": f(emb), "b_3": f(emb), "b_4": f(n_in)}
    if model == "seq2seqtsn":
        return {"Seq2seqTSN/W_encode": f(n_in, emb),
                "Seq2seqTSN/b_encode": f(emb),
                "Seq2seqTSN/W_decode1": f(emb, emb),
                "Seq2seqTSN/b_decode1": f(emb),
                "Seq2seqTSN/b_decode2": f(n_in),
                # encoder consumes the W_encode projection (networks.py:74-76)
                "Seq2seqTSN/encoder/lstm_cell/kernel": f(2 * emb, 4 * emb),
                "Seq2seqTSN/encoder/lstm_cell/bias": f(4 * emb),
                "Seq2seqTSN/decoder/lstm_cell/kernel": f(n_in + emb, 4 * emb),
                "Seq2seqTSN/decoder/lstm_cell/bias": f(4 * emb)}
    if model == "pairsim":  # concat variant: W_pairwise [2n, n]
        return {"PairSim/W_pairwise": f(2 * emb, emb),
                "PairSim/b_pairwise": f(emb),
                "PairSim/W_o": f(emb, 2), "PairSim/b_o": f(2)}
    if model == "pairsim2":  # squared-difference variant: [n, n]
        return {"PairSim/W_pairwise": f(emb, emb),
                "PairSim/b_pairwise": f(emb),
                "PairSim/W_o": f(emb, 2), "PairSim/b_o": f(2)}
    if model == "pddm":
        return {"PDDM/W_u": f(emb, emb), "PDDM/b_u": f(emb),
                "PDDM/W_v": f(emb, emb), "PDDM/b_v": f(emb),
                "PDDM/W_c": f(2 * emb, emb), "PDDM/b_c": f(emb),
                "PDDM/W_s": f(emb, 2), "PDDM/b_s": f(2)}
    if model == "outputlayer":
        return {"OutputLayer/W": f(n_in, emb), "OutputLayer/b": f(emb),
                "OutputLayer/W_o": f(emb, emb), "OutputLayer/b_o": f(emb)}
    if model == "cublayer":
        return {"CUBLayer/W": f(n_in, emb), "CUBLayer/b": f(emb)}
    raise AssertionError(model)


@pytest.mark.parametrize("model", [
    "tsn", "rtsn", "convtsn", "convtsnclassifier", "convrtsn",
    "convbirtsn", "convlstm", "sae", "seq2seqtsn", "pairsim", "pairsim2",
    "pddm", "outputlayer", "cublayer"])
def test_every_supported_model_imports(model, tmp_path):
    """Each mapping table fills its flax template completely (total
    coverage is enforced inside convert) and the imported model applies
    finitely — catches any path typo for models without a NumPy oracle."""
    from multimodal_similarity_tpu.tools import import_tf1 as cli
    variables = _variables_for(model)
    mod, args, kwargs = cli._build(model, variables, 3, 2, 3, 4)
    template = mod.init(jax.random.PRNGKey(0), *args, **kwargs)["params"]
    params = convert_tf1_variables(model, variables, template)
    out = mod.apply({"params": params}, *args, **kwargs)
    leaves = jax.tree_util.tree_leaves(out)
    assert leaves and all(np.all(np.isfinite(np.asarray(l)))
                          for l in leaves)


_TF1_WRITER = r"""
import sys
import numpy as np
import tensorflow.compat.v1 as tf1
tf1.disable_eager_execution()
prefix = sys.argv[1]
rng = np.random.RandomState(7)
g = tf1.Graph()
with g.as_default():
    with tf1.variable_scope("RTSN"):
        tf1.get_variable("W_1", initializer=rng.randn(6, 10)
                         .astype(np.float32))
        tf1.get_variable("b_1", initializer=rng.randn(10)
                         .astype(np.float32))
        with tf1.variable_scope("rnn/lstm_cell"):
            tf1.get_variable("kernel", initializer=(
                0.3 * rng.randn(20, 40)).astype(np.float32))
            tf1.get_variable("bias", initializer=rng.randn(40)
                             .astype(np.float32))
    tf1.get_variable("global_step", initializer=np.int64(123))
    saver = tf1.train.Saver()
    with tf1.Session() as sess:
        sess.run(tf1.global_variables_initializer())
        saver.save(sess, prefix)
"""


@pytest.mark.slow
def test_real_tf1_ckpt_roundtrip(tmp_path):
    """A genuine name-based .ckpt written by tf.compat.v1 Saver, imported
    through the CLI — validates the TF reader + slot filtering on the real
    on-disk format, and output parity against the .npz path."""
    pytest.importorskip("tensorflow")
    prefix = str(tmp_path / "ref_model.ckpt")
    r = subprocess.run([sys.executable, "-c", _TF1_WRITER, prefix],
                       capture_output=True, text=True,
                       env=dict(os.environ, JAX_PLATFORMS="cpu",
                                CUDA_VISIBLE_DEVICES=""))
    assert r.returncode == 0, r.stderr[-2000:]

    variables = read_tf1_checkpoint(prefix)
    assert "global_step" not in variables
    assert set(variables) == {"RTSN/W_1", "RTSN/b_1",
                              "RTSN/rnn/lstm_cell/kernel",
                              "RTSN/rnn/lstm_cell/bias"}

    from multimodal_similarity_tpu.tools import import_tf1 as cli
    out = str(tmp_path / "params.msgpack")
    cli.main(["--ckpt", prefix, "--model", "rtsn", "--output", out])
    params = load_pytree(out, None)["params"]
    np.testing.assert_array_equal(
        np.asarray(params["lstm"]["cell"]["kernel"]["kernel"]),
        variables["RTSN/rnn/lstm_cell/kernel"])
    np.testing.assert_array_equal(np.asarray(params["fc1"]["kernel"]),
                                  variables["RTSN/W_1"])
