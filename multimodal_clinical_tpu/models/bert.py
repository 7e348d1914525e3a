"""BERT-base text encoder (post-LayerNorm transformer) for the food101
legacy towers and fakenews.

Reference: food101/joint_model_proba_logits.py:12-27 — a frozen
``BertForTokenClassification('bert-base-uncased')`` whose final-layer
hidden states feed a trainable ``Linear(768, C)`` on the [CLS] token.
This is the HF ``BertModel`` architecture exactly (embeddings with
word/position/token-type + LayerNorm eps 1e-12, 12 post-LN layers with
exact-GELU intermediate 3072), written natively in Flax so the framework
carries no HF model dependency; weights port from any torch BertModel
state_dict via ``models.torch_port.port_bert``.

Attention masking: pad id 0 (bert-base-uncased [PAD]) — the mask is
derived from the ids, matching the tokenizer's attention_mask for
right-padded batches (food101/get_data_old.py:100 collate).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

VOCAB = 30522
WIDTH = 768
LAYERS = 12
HEADS = 12
MLP_DIM = 3072
MAX_POS = 512
EPS = 1e-12
PAD_ID = 0


class BertLayer(nn.Module):
    """One post-LN encoder layer (HF BertLayer)."""

    width: int = WIDTH
    heads: int = HEADS
    mlp_dim: int = MLP_DIM
    dropout: float = 0.1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, mask, train: bool = True):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, param_dtype=jnp.float32,
            dropout_rate=self.dropout, deterministic=not train,
            name="attention")(x, x, mask=mask)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        x = nn.LayerNorm(epsilon=EPS, param_dtype=jnp.float32,
                         name="attention_norm")(x + attn)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="intermediate")(x)
        h = nn.gelu(h, approximate=False)  # HF BERT uses exact gelu
        h = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32,
                     name="output")(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.LayerNorm(epsilon=EPS, param_dtype=jnp.float32,
                            name="output_norm")(x + h)


class BertEncoder(nn.Module):
    """ids (B, L) int32 -> final-layer hidden states (B, L, width)."""

    vocab_size: int = VOCAB
    width: int = WIDTH
    num_layers: int = LAYERS
    heads: int = HEADS
    mlp_dim: int = MLP_DIM
    max_pos: int = MAX_POS
    dropout: float = 0.1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, ids, train: bool = True):
        b, seq = ids.shape
        tok = nn.Embed(self.vocab_size, self.width, param_dtype=jnp.float32,
                       dtype=self.dtype, name="word_embeddings")(ids)
        pos = self.param("position_embeddings",
                         nn.initializers.normal(0.02),
                         (self.max_pos, self.width), jnp.float32)
        typ = self.param("token_type_embeddings",
                         nn.initializers.normal(0.02),
                         (2, self.width), jnp.float32)
        x = tok + pos[None, :seq, :].astype(tok.dtype) \
            + typ[None, 0:1, :].astype(tok.dtype)  # single-segment inputs
        x = nn.LayerNorm(epsilon=EPS, param_dtype=jnp.float32,
                         name="embeddings_norm")(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)

        attn_mask = (ids != PAD_ID)
        mask = attn_mask[:, None, None, :]  # (B, 1, 1, L) -> broadcast
        for i in range(self.num_layers):
            x = BertLayer(self.width, self.heads, self.mlp_dim,
                          self.dropout, self.dtype, name=f"layer_{i}")(
                              x, mask, train)
        return x


class BertClassifier(nn.Module):
    """Frozen BERT backbone + trainable Linear(width, C) on [CLS]
    (food101/joint_model_proba_logits.py:12-27)."""

    num_classes: int
    freeze_backbone: bool = True
    num_layers: int = LAYERS
    width: int = WIDTH
    heads: int = HEADS
    vocab_size: int = VOCAB
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, ids, train: bool = True):
        import jax

        from .common import TorchDense

        hidden = BertEncoder(vocab_size=self.vocab_size, width=self.width,
                             num_layers=self.num_layers, heads=self.heads,
                             mlp_dim=self.width * 4, dtype=self.dtype,
                             name="model")(ids, train)
        cls = hidden[:, 0, :]
        if self.freeze_backbone:
            cls = jax.lax.stop_gradient(cls)
        return TorchDense(self.num_classes, dtype=self.dtype,
                          name="classifier")(cls)
