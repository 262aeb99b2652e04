"""Transformer encoder-decoder baseline with autoregressive inference.

Reference: ``models/point_transformer.py:11-131`` — a small vanilla
encoder over unordered input segments + causal decoder over the ordered
pose sequence with teacher forcing at train time, EOS head, sinusoidal
positions. Autoregressive inference is a ``lax.scan`` over a static
``max_seq_len`` (the reference's early ``break`` at EOS becomes host-side
truncation of the returned probabilities — same outputs, jit-compatible).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np


def sinusoidal_positions(max_len: int, d_model: int) -> np.ndarray:
    pos = np.arange(max_len)[:, None]
    i = np.arange(0, d_model, 2)[None, :]
    rates = 1.0 / (10000 ** (i / d_model))
    enc = np.zeros((max_len, d_model), np.float32)
    enc[:, 0::2] = np.sin(pos * rates)
    enc[:, 1::2] = np.cos(pos * rates)
    return enc


class _TransformerLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int
    cross: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, memory=None, mask=None, train: bool = False):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, dtype=self.dtype)(x, x, mask=mask)
        x = nn.LayerNorm(dtype=jnp.float32)(x + attn)
        if self.cross:
            cross_attn = nn.MultiHeadDotProductAttention(
                num_heads=self.nhead, dtype=self.dtype)(x, memory)
            x = nn.LayerNorm(dtype=jnp.float32)(x + cross_attn)
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Dense(self.d_model, dtype=self.dtype)(h)
        return nn.LayerNorm(dtype=jnp.float32)(x + h)


class PointTransformer(nn.Module):
    """Encoder-decoder; train mode = teacher forcing, eval = autoregressive."""

    d_model: int = 64
    nhead: int = 4
    num_layers: int = 2
    dim_feedforward: int = 256
    max_seq_len: int = 100
    input_dim: int = 3
    outdim: int = 6
    weight_orient: float = 1.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.segments_embedding = nn.Dense(self.d_model, dtype=self.dtype)
        self.points_embedding = nn.Dense(self.d_model, dtype=self.dtype)
        self.encoder_layers = [
            _TransformerLayer(self.d_model, self.nhead, self.dim_feedforward,
                              dtype=self.dtype)
            for _ in range(self.num_layers)
        ]
        self.decoder_layers = [
            _TransformerLayer(self.d_model, self.nhead, self.dim_feedforward,
                              cross=True, dtype=self.dtype)
            for _ in range(self.num_layers)
        ]
        self.output_layer = nn.Dense(self.outdim, dtype=self.dtype)
        self.eos_layer = nn.Dense(1, dtype=self.dtype)
        self.pos_enc = jnp.asarray(
            sinusoidal_positions(self.max_seq_len + 1, self.d_model))

    def encode(self, src_points, train=False):
        x = self.segments_embedding(src_points)
        for layer in self.encoder_layers:
            x = layer(x, train=train)
        return x

    def decode(self, tgt_emb, memory, causal=True, train=False):
        L = tgt_emb.shape[1]
        mask = nn.make_causal_mask(jnp.zeros((tgt_emb.shape[0], L))) if causal else None
        x = tgt_emb
        for layer in self.decoder_layers:
            x = layer(x, memory=memory, mask=mask, train=train)
        return x

    def __call__(self, src_points, tgt_points=None, train: bool = False):
        memory = self.encode(src_points, train=train)
        if tgt_points is not None:
            # teacher forcing: prepend zero SOS pose
            B = tgt_points.shape[0]
            sos = jnp.zeros((B, 1, self.outdim), tgt_points.dtype)
            tgt = jnp.concatenate([sos, tgt_points], axis=1)
            emb = self.points_embedding(tgt) + self.pos_enc[None, : tgt.shape[1]]
            out = self.decode(emb, memory, train=train)
            points = self.output_layer(out)
            eos_probs = jax.nn.sigmoid(self.eos_layer(out))
            return points, eos_probs

        # autoregressive inference over a static horizon
        B = src_points.shape[0]
        seq0 = jnp.zeros((B, self.max_seq_len + 1, self.outdim))

        def step(carry, i):
            seq = carry
            emb = self.points_embedding(seq) + self.pos_enc[None]
            # causal mask ensures position i only sees 0..i
            out = self.decode(emb, memory)
            nxt = self.output_layer(out[:, i])
            eos = jax.nn.sigmoid(self.eos_layer(out[:, i]))
            seq = seq.at[:, i + 1].set(nxt)
            return seq, (nxt, eos)

        _, (points, eos_probs) = jax.lax.scan(
            step, seq0, jnp.arange(self.max_seq_len))
        # scan stacks on axis 0 -> (L, B, ...) -> (B, L, ...)
        return (jnp.swapaxes(points, 0, 1), jnp.swapaxes(eos_probs, 0, 1))
