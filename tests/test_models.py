import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_similarity_tpu.models import (
    SAE, TSN, RTSN, ConvBiRTSN, ConvLSTM, ConvRTSN, ConvTSN,
    ConvTSNClassifier, CUBLayer, OutputLayer, PDDM, PairSim, PairSim2,
    Seq2seqTSN, build_encoder, score_all_pairs)
from multimodal_similarity_tpu.models.lstm import LSTM


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_lstm_matches_tf_cell_semantics(rng):
    """Oracle: TF LSTMCell update with gate order (i, j, f, o) and
    forget_bias=1.0."""
    b, t, d, h = 2, 4, 3, 5
    x = rng.randn(b, t, d).astype(np.float32)
    model = LSTM(h)
    variables = model.init(jax.random.PRNGKey(0), jnp.array(x))
    out, (c_fin, h_fin) = model.apply(variables, jnp.array(x))

    w = np.asarray(variables["params"]["cell"]["kernel"]["kernel"])
    bias = np.asarray(variables["params"]["cell"]["kernel"]["bias"])
    c = np.zeros((b, h)); hh = np.zeros((b, h))
    outs = []
    for step in range(t):
        gates = np.concatenate([x[:, step], hh], axis=1) @ w + bias
        i, j, f, o = np.split(gates, 4, axis=1)
        c = _sigmoid(f + 1.0) * c + _sigmoid(i) * np.tanh(j)
        hh = _sigmoid(o) * np.tanh(c)
        outs.append(hh.copy())
    np.testing.assert_allclose(np.asarray(out), np.stack(outs, 1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_fin), outs[-1], rtol=1e-5,
                               atol=1e-5)


@pytest.mark.parametrize("network,shape", [
    ("tsn", (4, 3, 8)),
    ("rtsn", (4, 3, 8)),
    ("convtsn", (4, 3, 8, 8, 16)),
    ("convrtsn", (4, 3, 8, 8, 16)),
    ("convbirtsn", (4, 3, 8, 8, 16)),
])
def test_encoder_shapes(rng, network, shape):
    model = build_encoder(network, num_seg=3, emb_dim=32,
                          n_input=shape[-1], keep_prob=0.9)
    x = jnp.array(rng.randn(*shape).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    emb = model.apply(variables, x)
    assert emb.shape == (4, 32)
    # eval mode is deterministic
    emb2 = model.apply(variables, x)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(emb2))
    # train mode with dropout differs (models with dropout)
    if network in ("tsn", "rtsn", "convrtsn", "convbirtsn"):
        emb3 = model.apply(variables, x, train=True,
                           rngs={"dropout": jax.random.PRNGKey(7)})
        assert not np.allclose(np.asarray(emb), np.asarray(emb3))


def test_convlstm_seq_len_gather(rng):
    model = ConvLSTM(max_time=6, emb_dim=16, n_input=8, n_h=4, n_w=4, n_C=5)
    x = rng.randn(3, 6, 4, 4, 8).astype(np.float32)
    seq_len = jnp.array([6, 3, 1])
    variables = model.init(jax.random.PRNGKey(0), jnp.array(x), seq_len)
    out = model.apply(variables, jnp.array(x), seq_len)
    assert out.shape == (3, 16)
    # output for row 1 must equal running on the first 3 frames only
    out_trunc = model.apply(
        variables, jnp.array(x[1:2, :3]), jnp.array([3]))
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(out_trunc[0]),
                               rtol=1e-5, atol=1e-5)


def test_seq2seq_tsn(rng):
    model = Seq2seqTSN(n_seg=3, n_input=8, emb_dim=16)
    x = jnp.array(rng.randn(5, 3, 8).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    hidden, recon = model.apply(variables, x)
    assert hidden.shape == (5, 16)
    assert recon.shape == (5, 3, 8)
    # weight tying: the reconstruction head reuses W_encode
    assert "W_encode" in variables["params"]
    assert "W_decode2" not in variables["params"]


def test_seq2seq_reverse_flag(rng):
    x = rng.randn(2, 3, 8).astype(np.float32)
    m_f = Seq2seqTSN(n_seg=3, n_input=8, emb_dim=16, reverse=False)
    m_r = Seq2seqTSN(n_seg=3, n_input=8, emb_dim=16, reverse=True)
    v = m_f.init(jax.random.PRNGKey(0), jnp.array(x))
    h_f, _ = m_f.apply(v, jnp.array(x))
    h_r, _ = m_r.apply(v, jnp.array(x[:, ::-1]))
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_r), rtol=1e-6)


def test_sae_tied_weights(rng):
    model = SAE(n_input=8, emb_dim=16)
    x = jnp.array(rng.randn(4, 8).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    hidden, recon = model.apply(variables, x)
    assert hidden.shape == (4, 16) and recon.shape == (4, 8)
    p = variables["params"]
    w1, b1 = np.asarray(p["W_1"]), np.asarray(p["b_1"])
    w2, b2 = np.asarray(p["W_2"]), np.asarray(p["b_2"])
    b3, b4 = np.asarray(p["b_3"]), np.asarray(p["b_4"])
    xn = np.asarray(x)
    h = np.maximum(xn @ w1 + b1, 0)
    hid = h @ w2 + b2
    rec = np.maximum(hid @ w2.T + b3, 0) @ w1.T + b4
    np.testing.assert_allclose(np.asarray(recon), rec, rtol=1e-5, atol=1e-5)


def test_projection_heads(rng):
    x = jnp.array(rng.randn(6, 24).astype(np.float32))
    out_layer = OutputLayer(n_output=10, keep_prob=0.8)
    v = out_layer.init(jax.random.PRNGKey(0), x)
    assert out_layer.apply(v, x).shape == (6, 10)
    cub = CUBLayer(n_output=10, keep_prob=0.8)
    v = cub.init(jax.random.PRNGKey(0), x)
    assert cub.apply(v, x).shape == (6, 10)


def test_classifier(rng):
    model = ConvTSNClassifier(n_seg=3, emb_dim=16, n_input=8, n_h=4, n_w=4,
                              n_C=5, n_output=7)
    x = jnp.array(rng.randn(4, 3, 4, 4, 8).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x)
    feat, logits = model.apply(v, x)
    assert feat.shape == (4, 16) and logits.shape == (4, 7)


@pytest.mark.parametrize("head_cls", [PairSim, PairSim2, PDDM])
def test_pair_heads(rng, head_cls):
    model = head_cls(n_input=16)
    x = jnp.array(rng.randn(5, 2, 16).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x)
    logits, prob = model.apply(v, x)
    assert logits.shape == (5, 2) and prob.shape == (5, 2)
    np.testing.assert_allclose(np.asarray(prob).sum(1), 1.0, rtol=1e-5)


def test_pddm_symmetric(rng):
    model = PDDM(n_input=16)
    a = jnp.array(rng.randn(5, 16).astype(np.float32))
    b = jnp.array(rng.randn(5, 16).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), jnp.stack([a, b], 1))
    _, p_ab = model.apply(v, a, b, method="score")
    _, p_ba = model.apply(v, b, a, method="score")
    np.testing.assert_allclose(np.asarray(p_ab), np.asarray(p_ba), rtol=1e-5,
                               atol=1e-6)


def test_score_all_pairs_matches_direct(rng):
    import functools
    model = PDDM(n_input=8)
    emb = jnp.array(rng.randn(10, 8).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), jnp.stack([emb, emb], 1))
    score_fn = functools.partial(model.apply, v, method="score")
    sims = score_all_pairs(score_fn, emb, block=4)
    assert sims.shape == (10, 10)
    for i in range(0, 10, 3):
        for j in range(0, 10, 4):
            _, p = model.apply(v, emb[i:i + 1], emb[j:j + 1], method="score")
            np.testing.assert_allclose(float(sims[i, j]), float(p[0, 1]),
                                       rtol=1e-5, atol=1e-6)


def test_score_all_pairs_sym_matches_full(rng):
    """Triangular pass == full pass for the symmetric heads, at aligned
    and non-aligned N, and for a PairSim2 head too."""
    import functools

    from multimodal_similarity_tpu.models import (PairSim2,
                                                  score_all_pairs_sym)
    for head, n in ((PDDM(n_input=8), 10), (PDDM(n_input=8), 16),
                    (PairSim2(n_input=8), 13)):
        emb = jnp.array(rng.randn(n, 8).astype(np.float32))
        v = head.init(jax.random.PRNGKey(0), jnp.stack([emb, emb], 1))
        score_fn = functools.partial(head.apply, v, method="score")
        full = np.asarray(score_all_pairs(score_fn, emb, block=4))
        sym = np.asarray(score_all_pairs_sym(score_fn, emb, block=4))
        np.testing.assert_allclose(sym, full, rtol=1e-6, atol=1e-7)


def test_build_encoder_unknown():
    with pytest.raises(NotImplementedError):
        build_encoder("resnet50")


def test_lstm_remat_matches(rng):
    """remat=True is numerics-identical (recompute only changes memory)."""
    x = jnp.array(rng.randn(3, 6, 4).astype(np.float32))
    m1 = LSTM(8)
    m2 = LSTM(8, remat=True)
    v = m1.init(jax.random.PRNGKey(0), x)
    o1, _ = m1.apply(v, x)
    o2, _ = m2.apply(v, x)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-6)
    # gradients flow through the remat path
    g = jax.grad(lambda vv: m2.apply(vv, x)[0].sum())(v)
    assert np.isfinite(np.asarray(jax.tree.leaves(g)[0])).all()
