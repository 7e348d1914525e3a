"""Per-benchmark fusion networks.

Every network follows one contract: ``__call__(*modality_inputs, train)``
returns a dict with
  * ``"logits"``   — list of per-modality unimodal logit tensors (B, C)
  * ``"embeddings"`` — optional list of per-modality embeddings (VICReg)

Fusion (logit-mean / prob-mean / QMF dynamic fusion) and losses live in the
engine's step factories (engine/contracts.py), NOT in the network — the five
reference base classes share fusion math that the reference re-implements in
every ``<ds>/joint_model*.py`` FusionNet; here it exists once.

Submodule names follow the reference's attribute contract (``x1_model``,
``x2_model``, …) so the OGM-GE gradient transform can address the encoder
subtrees (existing_algos/OGM_GE.py:56-57).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .common import TorchDense, global_avg_pool
from .lenet import LeNet
from .mlp import HeadMLP, MimicMLP
from .pretrained import ResNet18Slim, VGG11Slim
from .resnet import BottleneckResNetEncoder, ResNetEncoder
from .rnn import GRUNet, LstmClassifier


class AVMnistFusionNet(nn.Module):
    """LeNet pair for AV-MNIST (avmnist/joint_model.py:101-130).

    x1: (B, 28, 28, 1) image; x2: (B, 112, 112, 1) spectrogram.  The
    reference applies ReLU to the encoder output before the classifier.
    """

    num_classes: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x1, x2, train: bool = True):
        h1 = nn.relu(LeNet(6, 3, dtype=self.dtype, name="x1_model")(x1, train))
        h2 = nn.relu(LeNet(6, 5, dtype=self.dtype, name="x2_model")(x2, train))
        l1 = TorchDense(self.num_classes, dtype=self.dtype, name="classifier_x1")(h1)
        l2 = TorchDense(self.num_classes, dtype=self.dtype, name="classifier_x2")(h2)
        return {"logits": [l1, l2]}


class MimicFusionNet(nn.Module):
    """MLP (static 5-dim) + GRU (24x12 time series) for MIMIC
    (mimic/joint_model.py:72-125)."""

    num_classes: int
    gru_hidden_dim: int = 32
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x1, x2, train: bool = True):
        l1 = MimicMLP(self.num_classes, dtype=self.dtype, name="x1_model")(x1, train)
        l2 = GRUNet(self.gru_hidden_dim, self.num_classes, dtype=self.dtype,
                    name="x2_model")(x2, train)
        return {"logits": [l1, l2]}


class CremadFusionNet(nn.Module):
    """Scratch ResNet18 audio + visual for Crema-D / AVE / VGGSound
    (cremad/joint_model.py:14-60).

    x1: (B, F, T, 1) log-spectrogram; x2: (B, T, H, W, 3) frames.  Time is
    folded into the batch for the visual stem (backbone.py:178-181) and
    pooled jointly with space afterwards (joint_model.py:43-50).
    """

    num_classes: int
    dtype: Optional[Any] = None
    remat: Optional[str] = None  # see ResNetEncoder.remat
    stem_space_to_depth: bool = False  # see ResNetEncoder
    pool_kernel: str = "xla"  # see ResNetEncoder

    @nn.compact
    def __call__(self, x1, x2, train: bool = True):
        a = ResNetEncoder(dtype=self.dtype, remat=self.remat,
                          stem_space_to_depth=self.stem_space_to_depth,
                          pool_kernel=self.pool_kernel,
                          name="x1_model")(x1, train)
        b, t = x2.shape[0], x2.shape[1]
        v_in = x2.reshape((b * t,) + x2.shape[2:])
        v = ResNetEncoder(dtype=self.dtype, remat=self.remat,
                          stem_space_to_depth=self.stem_space_to_depth,
                          pool_kernel=self.pool_kernel,
                          name="x2_model")(v_in, train)
        a = global_avg_pool(a)                        # (B, 512)
        v = v.reshape(b, t, *v.shape[1:])
        v = jnp.mean(v, axis=(1, 2, 3))               # pool over (T, h, w)
        l1 = TorchDense(self.num_classes, dtype=self.dtype, name="x1_classifier")(a)
        l2 = TorchDense(self.num_classes, dtype=self.dtype, name="x2_classifier")(v)
        return {"logits": [l1, l2]}


class EnricoFusionNet(nn.Module):
    """ResNet18Slim pair for Enrico (enrico/joint_model.py:54-77).

    ``freeze_features=True`` for the joint model, False for the ensemble
    (enrico/ensemble_model.py).  Emits embeddings for the VICReg variant
    (enrico/ensemble_model_vicreg.py:103-111).
    """

    num_classes: int
    freeze_features: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x1, x2, train: bool = True):
        e1, l1 = ResNet18Slim(self.num_classes, self.freeze_features,
                              dtype=self.dtype, name="x1_model")(x1, train)
        e2, l2 = ResNet18Slim(self.num_classes, self.freeze_features,
                              dtype=self.dtype, name="x2_model")(x2, train)
        return {"logits": [l1, l2], "embeddings": [e1, e2]}


class EnricoVGGFusionNet(nn.Module):
    """VGG11Slim pair (enrico/joint_model_counts.py:58-) — analysis variant."""

    num_classes: int
    freeze_features: bool = True
    dropout_p: float = 0.2
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x1, x2, train: bool = True):
        l1 = VGG11Slim(self.num_classes, dropout_p=self.dropout_p,
                       freeze_features=self.freeze_features,
                       dtype=self.dtype, name="x1_model")(x1, train)
        l2 = VGG11Slim(self.num_classes, dropout_p=self.dropout_p,
                       freeze_features=self.freeze_features,
                       dtype=self.dtype, name="x2_model")(x2, train)
        return {"logits": [l1, l2]}


class MustardFusionNet(nn.Module):
    """Three LstmClassifiers (vision 371 / audio 81 / text 300 GloVe) for
    MUsTARD (mustard/joint_model.py:45-83)."""

    num_classes: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x1, x2, x3, train: bool = True):
        l1 = LstmClassifier(self.num_classes, dtype=self.dtype, name="x1_model")(x1, train)
        l2 = LstmClassifier(self.num_classes, dtype=self.dtype, name="x2_model")(x2, train)
        l3 = LstmClassifier(self.num_classes, dtype=self.dtype, name="x3_model")(x3, train)
        return {"logits": [l1, l2, l3]}


class Food101LegacyFusionNet(nn.Module):
    """Legacy food101 towers (food101/joint_model_proba_logits.py:30-90):
    frozen torchvision-resnet50 image tower with a fresh trainable
    ``fc`` head, and a frozen BERT-base text tower with a trainable
    [CLS] classifier.  x1: (B, 224, 224, 3) image; x2: (B, L) int32
    bert-base-uncased token ids (pad 0).

    ``requires_grad=False`` maps to ``stop_gradient`` on the frozen
    features; BN running stats / dropout still follow train mode exactly
    like torch (the reference never calls ``.eval()`` on the frozen
    towers).  Weights port via ``torch_port.port_bottleneck_encoder`` /
    ``port_bert`` from local checkpoints (zero-egress environment).
    """

    num_classes: int
    # shrinkable geometry for CPU tests; defaults are the real towers
    stage_sizes: Any = (3, 4, 6, 3)
    bert_layers: int = 12
    bert_width: int = 768
    bert_heads: int = 12
    bert_vocab: int = 30522
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x1, x2, train: bool = True):
        import jax

        from .bert import BertClassifier
        from .resnet import BottleneckResNetEncoder

        class ImageTower(nn.Module):
            """resnet50 minus fc (frozen) + trainable fc — submodule so the
            param tree reads x1_model/{features, fc}."""

            num_classes: int
            stage_sizes: Any
            dtype: Optional[Any]

            @nn.compact
            def __call__(self, x, train: bool = True):
                feats = BottleneckResNetEncoder(
                    stage_sizes=self.stage_sizes, dtype=self.dtype,
                    name="features")(x, train)
                emb = global_avg_pool(feats)
                emb = jax.lax.stop_gradient(emb)  # frozen backbone
                return TorchDense(self.num_classes, dtype=self.dtype,
                                  name="fc")(emb)

        l1 = ImageTower(self.num_classes, self.stage_sizes, self.dtype,
                        name="x1_model")(x1, train)
        l2 = BertClassifier(
            self.num_classes, freeze_backbone=True,
            num_layers=self.bert_layers, width=self.bert_width,
            heads=self.bert_heads, vocab_size=self.bert_vocab,
            dtype=self.dtype, name="x2_model")(x2, train)
        return {"logits": [l1, l2]}


class Food101FusionNet(nn.Module):
    """SigLIP dual tower + MLP heads for Food101 (food101/joint_model.py:26-66).

    x1: (B, L) int32 token ids; x2: (B, H, W, 3) pixel values.  The SigLIP
    backbone (models/siglip.py) is fully trainable like the reference's
    AutoModel; the heads are named x1_model/x2_model, matching the reference
    (which makes OGM-GE a documented no-op on this benchmark since the heads
    have no 4-D params — food101/joint_model_ogm_ge.py, SURVEY §2.3).
    """

    num_classes: int
    dtype: Optional[Any] = None
    # GPipe the 12-block towers over a mesh 'stage' axis (config keys
    # pipeline_stages / pipeline_microbatches + mesh_shape: {stage: S};
    # models/siglip.PipelinedEncoderStack).  0 = off.
    pipeline_stages: int = 0
    pipeline_microbatches: int = 4
    # sequence parallelism: token/patch dims sharded over 'model'
    # (config key sequence_sharding + mesh_shape: {model: M})
    sequence_sharding: bool = False
    mesh: Any = None

    @nn.compact
    def __call__(self, x1, x2, train: bool = True):
        from .siglip import SigLIPModel  # local import: heavy module

        text_emb, image_emb = SigLIPModel(
            dtype=self.dtype, name="model",
            pipeline_stages=self.pipeline_stages,
            pipeline_microbatches=self.pipeline_microbatches,
            sequence_sharding=self.sequence_sharding,
            mesh=self.mesh)(x1, x2, train)
        l1 = HeadMLP(self.num_classes, dtype=self.dtype, name="x1_model")(
            text_emb, train
        )
        l2 = HeadMLP(self.num_classes, dtype=self.dtype, name="x2_model")(
            image_emb, train
        )
        return {"logits": [l1, l2]}


class TextTransformer(nn.Module):
    """Small pre-LN transformer text encoder over tokenized ids (padding id
    0 masked), mean-pooled.  Used by the FakeNews towers."""

    vocab_size: int = 30522
    embed_dim: int = 256
    num_heads: int = 4
    num_layers: int = 2
    max_len: int = 512  # fixed "pos" table size: the param tree must not
    # depend on the batch's sequence length (checkpoints stay loadable
    # across max_seq_len settings — repo param-tree-stability convention)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, ids, train: bool = True):
        if ids.shape[1] > self.max_len:
            raise ValueError(
                f"sequence length {ids.shape[1]} > max_len {self.max_len}")
        emb = nn.Embed(self.vocab_size, self.embed_dim,
                       param_dtype=jnp.float32, dtype=self.dtype,
                       name="embed")(ids)
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (1, self.max_len, self.embed_dim), jnp.float32)
        h = emb + pos[:, : ids.shape[1]].astype(emb.dtype)
        mask = (ids != 0)[:, None, None, :]
        for i in range(self.num_layers):
            normed = nn.LayerNorm(param_dtype=jnp.float32, name=f"ln1_{i}")(h)
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, dtype=self.dtype,
                param_dtype=jnp.float32, name=f"attn_{i}",
            )(normed, mask=mask)
            h = h + attn
            mlp_in = nn.LayerNorm(param_dtype=jnp.float32, name=f"ln2_{i}")(h)
            mlp = nn.Dense(4 * self.embed_dim, dtype=self.dtype,
                           param_dtype=jnp.float32, name=f"mlp1_{i}")(mlp_in)
            mlp = nn.Dense(self.embed_dim, dtype=self.dtype,
                           param_dtype=jnp.float32,
                           name=f"mlp2_{i}")(nn.gelu(mlp))
            h = h + mlp
        token_mask = mask[:, 0, 0, :]
        denom = jnp.maximum(jnp.sum(token_mask, axis=-1, keepdims=True), 1)
        return jnp.sum(h * token_mask[..., None], axis=1) / denom


class FakeNewsFusionNet(nn.Module):
    """Text + image (+ optional dialogue) late fusion for Fakeddit.

    The reference left this benchmark broken twice over:
    fakenews/run_training.py:42-44 imports a joint_model that does not
    exist, and fakenews/data_preprocessing.py:54 has a literal syntax error
    (``text_embedder =``).  This completes the design in the framework's
    late-fusion style: a small text transformer over BERT-tokenized ids and
    a scratch ResNet18 image encoder; ``with_dialogue`` adds a third tower
    over summarized-comment tokens — the equivalent of the reference's
    MultimodalFakeNewsDetectionModelWithDialogue (fakenews/model.py:34-150).
    """

    num_classes: int
    vocab_size: int = 30522
    embed_dim: int = 256
    num_heads: int = 4
    num_layers: int = 2
    with_dialogue: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x1, x2, x3=None, train: bool = True):
        common = dict(vocab_size=self.vocab_size, embed_dim=self.embed_dim,
                      num_heads=self.num_heads, num_layers=self.num_layers,
                      dtype=self.dtype)
        text_emb = TextTransformer(**common, name="x1_model")(x1, train)
        l1 = TorchDense(self.num_classes, dtype=self.dtype,
                        name="x1_classifier")(text_emb)
        feats = ResNetEncoder(dtype=self.dtype, name="x2_model")(x2, train)
        l2 = TorchDense(self.num_classes, dtype=self.dtype,
                        name="x2_classifier")(global_avg_pool(feats))
        logits = [l1, l2]
        if self.with_dialogue:
            dlg_emb = TextTransformer(**common, name="x3_model")(x3, train)
            logits.append(TorchDense(self.num_classes, dtype=self.dtype,
                                     name="x3_classifier")(dlg_emb))
        return {"logits": logits}


class FakeNewsEmbedFusionNet(nn.Module):
    """The reference's one RUNNABLE fakenews architecture: concat fusion
    over precomputed sentence-transformer embeddings
    (fakenews/model.py:34-148, ``_build_model`` 234-257).

    Towers: ``relu(Linear(768 -> 300))`` on the text embedding, a
    Bottleneck-ResNet152 image encoder whose classifier fc is replaced by
    ``Linear(2048 -> 300)`` (model.py:238-241, ``RESNET_OUT_DIM=2048``),
    and — for the dialogue variant (the only LightningModule actually
    present in model.py:150) — ``relu(Linear(768 -> 300))`` on the
    dialogue-summary embedding.  Fusion (model.py:59-74, 119-133):
    ``concat -> dropout(relu(Linear(-> 512))) -> relu(fc1 512 -> 512) ->
    fc2 -> CE`` — a single fused logits head, so the spec binds it as a
    ``jlogits`` contract with ``num_modality=1`` (CE on the mean of one
    logit head IS the reference's CE on the head).  ``image_stage_sizes``
    shrinks the tower for tests; the default is torchvision resnet152's
    (3, 8, 36, 3).
    """

    num_classes: int
    embedding_dim: int = 768       # SENTENCE_TRANSFORMER_... model.py:27
    text_feature_dim: int = 300    # hparams default, model.py:158
    image_feature_dim: int = 300   # defaults to text_feature_dim (159)
    dialogue_feature_dim: int = 300
    fusion_output_size: int = 512  # hparams default, model.py:255
    hidden_size: int = 512         # model.py:46
    dropout_p: float = 0.1         # DROPOUT_P, model.py:19
    with_dialogue: bool = False
    image_stage_sizes: Sequence[int] = (3, 8, 36, 3)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x1, x2, x3=None, train: bool = True):
        if x1.shape[-1] != self.embedding_dim:
            raise ValueError(
                f"text embedding dim {x1.shape[-1]} != configured "
                f"embedding_dim {self.embedding_dim} (text_embed_dim key)")
        text = nn.relu(TorchDense(self.text_feature_dim, dtype=self.dtype,
                                  name="text_module")(x1))
        feats = BottleneckResNetEncoder(
            stage_sizes=tuple(self.image_stage_sizes), dtype=self.dtype,
            name="image_module")(x2, train)
        image = nn.relu(TorchDense(self.image_feature_dim, dtype=self.dtype,
                                   name="image_fc")(global_avg_pool(feats)))
        parts = [text, image]
        if self.with_dialogue:
            parts.append(nn.relu(TorchDense(
                self.dialogue_feature_dim, dtype=self.dtype,
                name="dialogue_module")(x3)))
        combined = jnp.concatenate(parts, axis=-1)
        fused = nn.Dropout(self.dropout_p, deterministic=not train)(
            nn.relu(TorchDense(self.fusion_output_size, dtype=self.dtype,
                               name="fusion")(combined)))
        hidden = nn.relu(TorchDense(self.hidden_size, dtype=self.dtype,
                                    name="fc1")(fused))
        logits = TorchDense(self.num_classes, dtype=self.dtype,
                            name="fc2")(hidden)
        return {"logits": [logits]}
