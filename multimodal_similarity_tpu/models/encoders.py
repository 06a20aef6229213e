"""Temporal encoder zoo (flax.linen).

Rebuilds the reference model zoo (networks.py:8-716) TPU-first:

- the 1x1 "conv" embeddings are Dense layers over the channel axis (identical
  math, one MXU matmul over [B*T*H*W, C_in]);
- LSTMs are lax.scan over a fused-gate cell (models/lstm.py) instead of
  tf.nn.dynamic_rnn;
- dropout mirrors the reference placement: DropoutWrapper *input* dropout on
  recurrent encoders, plain dropout in the MLP encoders.

Every module returns its embedding (the reference's ``.hidden``); autoencoders
also return reconstructions.  Weight init is Xavier-uniform + zero bias,
matching tf.contrib.layers.xavier_initializer (networks.py:28 etc.).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
from flax import linen as nn

from multimodal_similarity_tpu.models.lstm import LSTM, BiLSTM

Array = jnp.ndarray

Dense = functools.partial(
    nn.Dense,
    kernel_init=nn.initializers.xavier_uniform(),
    bias_init=nn.initializers.zeros_init(),
)


class TSN(nn.Module):
    """2-layer MLP per segment, mean-pooled over segments (networks.py:425-465)."""

    n_seg: int = 3
    emb_dim: int = 128
    n_input: int = 8
    keep_prob: float = 1.0

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        b = x.shape[0]
        h = nn.relu(Dense(self.emb_dim, name="fc1")(
            x.reshape(b * self.n_seg, self.n_input)))
        h = nn.Dropout(1.0 - self.keep_prob, deterministic=not train)(h)
        h = Dense(self.emb_dim, name="fc2")(h)
        return jnp.mean(h.reshape(b, self.n_seg, self.emb_dim), axis=1)


class RTSN(nn.Module):
    """Linear embed + LSTM over segments, last output (networks.py:383-422)."""

    n_seg: int = 3
    emb_dim: int = 128
    n_input: int = 8
    keep_prob: float = 1.0

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        b = x.shape[0]
        h = nn.relu(Dense(self.emb_dim, name="fc1")(
            x.reshape(b * self.n_seg, self.n_input)))
        h = h.reshape(b, self.n_seg, self.emb_dim)
        # DropoutWrapper input dropout (networks.py:413)
        h = nn.Dropout(1.0 - self.keep_prob, deterministic=not train)(h)
        outputs, _ = LSTM(self.emb_dim, name="lstm")(h)
        return outputs[:, -1]


class _ConvEmbed(nn.Module):
    """relu(1x1 conv) channel embedding shared by the Conv* encoders
    (networks.py:510-514 etc.) — a Dense over the channel axis."""

    n_C: int = 20

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # x: [..., n_h, n_w, n_input] -> [..., n_h * n_w * n_C]
        h = nn.relu(Dense(self.n_C, name="conv1x1")(x))
        return h.reshape(*h.shape[:-3], -1)


class ConvTSN(nn.Module):
    """1x1 conv embed + FC, mean over segments (networks.py:611-654)."""

    n_seg: int = 3
    n_C: int = 20
    emb_dim: int = 256
    n_input: int = 1536
    n_h: int = 8
    n_w: int = 8

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        b = x.shape[0]
        h = _ConvEmbed(self.n_C, name="embed")(x)        # [B, S, h*w*C]
        h = Dense(self.emb_dim, name="fc")(h)            # [B, S, emb]
        return jnp.mean(h, axis=1)


class ConvRTSN(nn.Module):
    """1x1 conv embed + LSTM over segments — the workhorse video encoder
    (networks.py:519-559)."""

    n_seg: int = 3
    n_C: int = 20
    emb_dim: int = 128
    n_input: int = 1536
    n_h: int = 8
    n_w: int = 8
    keep_prob: float = 1.0

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        h = _ConvEmbed(self.n_C, name="embed")(x)        # [B, S, h*w*C]
        h = nn.Dropout(1.0 - self.keep_prob, deterministic=not train)(h)
        outputs, _ = LSTM(self.emb_dim, name="lstm")(h)
        return outputs[:, -1]


class ConvBiRTSN(nn.Module):
    """1x1 conv embed + bidirectional LSTM (emb_dim/2 per direction),
    concat outputs at the last step (networks.py:468-515)."""

    n_seg: int = 3
    n_C: int = 20
    emb_dim: int = 128
    n_input: int = 1536
    n_h: int = 8
    n_w: int = 8
    keep_prob: float = 1.0

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        h = _ConvEmbed(self.n_C, name="embed")(x)
        h = nn.Dropout(1.0 - self.keep_prob, deterministic=not train)(h)
        outputs = BiLSTM(self.emb_dim // 2, name="bilstm")(h)
        return outputs[:, -1]


class ConvLSTM(nn.Module):
    """1x1 conv embed + LSTM over full frame sequences with true lengths;
    reads the output at seq_len - 1 (networks.py:563-606)."""

    max_time: int
    n_C: int = 20
    emb_dim: int = 128
    n_input: int = 1536
    n_h: int = 8
    n_w: int = 8

    @nn.compact
    def __call__(self, x: Array, seq_len: Array, train: bool = False) -> Array:
        h = _ConvEmbed(self.n_C, name="embed")(x)        # [B, T, h*w*C]
        outputs, _ = LSTM(self.emb_dim, name="lstm")(h)  # [B, T, emb]
        idx = (seq_len - 1).astype(jnp.int32)
        return jnp.take_along_axis(
            outputs, idx[:, None, None].repeat(outputs.shape[-1], axis=2),
            axis=1)[:, 0]


class ConvTSNClassifier(nn.Module):
    """ConvTSN + per-segment softmax head averaged over segments
    (networks.py:659-716).  Returns (feat, logits)."""

    n_seg: int = 3
    n_C: int = 20
    emb_dim: int = 256
    n_input: int = 1536
    n_h: int = 8
    n_w: int = 8
    n_output: int = 11
    keep_prob: float = 1.0

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        h = _ConvEmbed(self.n_C, name="embed")(x)        # [B, S, h*w*C]
        h = Dense(self.emb_dim, name="fc")(h)            # [B, S, emb]
        feat = jnp.mean(h, axis=1)
        hd = nn.Dropout(1.0 - self.keep_prob,
                        deterministic=not train)(nn.relu(h))
        out = Dense(self.n_output, name="head")(hd)      # [B, S, n_out]
        logits = jnp.mean(out, axis=1)
        return feat, logits


class Seq2seqTSN(nn.Module):
    """LSTM encoder-decoder autoencoder for unsupervised pretraining
    (networks.py:8-115): unconditioned decoder (zero inputs) initialized from
    the encoder final state; the reconstruction head ties W_encode^T.
    Returns (hidden, x_recon)."""

    n_seg: int
    n_input: int = 8
    emb_dim: int = 128
    reverse: bool = False
    keep_prob: float = 1.0

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        if self.reverse:
            x = x[:, ::-1, :]
        b = x.shape[0]

        w_encode = self.param("W_encode", nn.initializers.xavier_uniform(),
                              (self.n_input, self.emb_dim))
        b_encode = self.param("b_encode", nn.initializers.zeros_init(),
                              (self.emb_dim,))
        w_decode1 = self.param("W_decode1", nn.initializers.xavier_uniform(),
                               (self.emb_dim, self.emb_dim))
        b_decode1 = self.param("b_decode1", nn.initializers.zeros_init(),
                               (self.emb_dim,))
        b_decode2 = self.param("b_decode2", nn.initializers.zeros_init(),
                               (self.n_input,))

        h = nn.relu(x.reshape(-1, self.n_input) @ w_encode + b_encode)
        h = h.reshape(b, self.n_seg, self.emb_dim)
        h = nn.Dropout(1.0 - self.keep_prob, deterministic=not train)(h)

        enc_out, enc_state = LSTM(self.emb_dim, name="encoder")(h)
        hidden = enc_out[:, -1]

        dec_in = jnp.zeros((b, self.n_seg, self.n_input), x.dtype)
        dec_out, _ = LSTM(self.emb_dim, name="decoder")(
            dec_in, initial_state=enc_state)

        hd = nn.relu(dec_out.reshape(-1, self.emb_dim) @ w_decode1 + b_decode1)
        x_recon = hd @ w_encode.T + b_decode2
        return hidden, x_recon.reshape(b, self.n_seg, self.n_input)


class SAE(nn.Module):
    """2-layer tied-weight autoencoder (networks.py:119-164).
    Returns (hidden, x_recon)."""

    n_input: int = 8
    emb_dim: int = 128

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        w1 = self.param("W_1", nn.initializers.xavier_uniform(),
                        (self.n_input, self.emb_dim))
        b1 = self.param("b_1", nn.initializers.zeros_init(), (self.emb_dim,))
        w2 = self.param("W_2", nn.initializers.xavier_uniform(),
                        (self.emb_dim, self.emb_dim))
        b2 = self.param("b_2", nn.initializers.zeros_init(), (self.emb_dim,))
        b3 = self.param("b_3", nn.initializers.zeros_init(), (self.emb_dim,))
        b4 = self.param("b_4", nn.initializers.zeros_init(), (self.n_input,))

        h = nn.relu(x @ w1 + b1)
        hidden = h @ w2 + b2
        h_recon = nn.relu(hidden @ w2.T + b3)
        x_recon = h_recon @ w1.T + b4
        return hidden, x_recon


class OutputLayer(nn.Module):
    """2-layer FC projection head (networks.py:322-354)."""

    n_output: int
    keep_prob: float = 1.0

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        hidden = Dense(self.n_output, name="fc")(x)
        h = nn.Dropout(1.0 - self.keep_prob,
                       deterministic=not train)(nn.relu(hidden))
        return Dense(self.n_output, name="out")(h)


class CUBLayer(nn.Module):
    """1-layer FC projection head with input dropout (networks.py:356-380)."""

    n_output: int
    keep_prob: float = 1.0

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        h = nn.Dropout(1.0 - self.keep_prob, deterministic=not train)(x)
        return Dense(self.n_output, name="fc")(h)
