"""SigLIP-base-patch16-224 dual tower in Flax (Food101 backbone).

Reimplements the architecture the reference pulls in via HF
``AutoModel.from_pretrained("google/siglip-base-patch16-224")``
(food101/joint_model.py:36-38) and finetunes end-to-end:

  * vision tower — ViT-B/16: 16x16 patch conv, learned position embeddings,
    12 pre-LN transformer blocks (width 768, 12 heads, MLP 3072, gelu-tanh),
    final LN, and SigLIP's MAP attention-pooling head (learned probe token).
  * text tower — 12 blocks over 64 sentencepiece tokens (vocab 32000),
    final LN, last-token pooling, linear head (HF SiglipTextModel pooling).

Returns (text_embeds, image_embeds), both (B, 768) — matching the
``output['text_embeds']/['image_embeds']`` the reference feeds its MLP heads
(food101/joint_model.py:55-58).

Pretrained weights: this environment has zero egress, so weights are ported
from a LOCAL HF checkpoint when ``load_hf_siglip_params`` is given a path
(safetensors or pytorch_model.bin read via torch-cpu); otherwise towers are
randomly initialized (documented divergence affecting absolute Food101
accuracy, not the training mechanics).

TPU notes: attention and MLP matmuls are (B*L, 768) x (768, ...) MXU-shaped;
compute dtype bf16 with fp32 params and LayerNorm statistics; static
sequence lengths (196 patches / 64 tokens) — no dynamic shapes under jit.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

WIDTH = 768
LAYERS = 12
HEADS = 12
MLP_DIM = 3072
PATCH = 16
IMAGE_SIZE = 224
TEXT_LEN = 64
VOCAB = 32000


def _gelu_tanh(x):
    return nn.gelu(x, approximate=True)


class EncoderBlock(nn.Module):
    dtype: Optional[Any] = None
    width: int = WIDTH
    heads: int = HEADS
    mlp_dim: int = MLP_DIM

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-6, param_dtype=jnp.float32,
                         name="layer_norm1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, param_dtype=jnp.float32,
            name="self_attn")(h, h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, param_dtype=jnp.float32,
                         name="layer_norm2")(x)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp_fc1")(h)
        h = _gelu_tanh(h)
        h = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp_fc2")(h)
        return x + h


def _maybe_shard_sequence(x, mesh, enabled: bool, initializing: bool):
    """Sequence parallelism (SP): constrain (B, L, W) activations to
    ``P(None, "model")`` — the token/patch dim sharded over the model
    axis — and let GSPMD insert the attention all-gathers.  Forward-
    looking scaling surface like FSDP/PP: at SigLIP's 196-patch /
    64-token lengths the collectives outweigh the savings, but the same
    annotation is how long-sequence towers shard on TPU.  No-op without
    a model axis > 1 (and during init)."""
    if not enabled or mesh is None or initializing:
        return x
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import MODEL_AXIS

    if dict(mesh.shape).get(MODEL_AXIS, 1) <= 1:
        return x
    if x.shape[1] % mesh.shape[MODEL_AXIS]:
        return x  # indivisible sequence: stay replicated
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(None, MODEL_AXIS)))


class _StageBlock(nn.Module):
    """One pipeline stage: ``blocks`` consecutive EncoderBlocks (named
    ``layers_{j}`` to mirror the unpipelined towers, so ported per-layer
    params stack straight in — ``stack_tower_layers``)."""

    blocks: int
    dtype: Optional[Any] = None
    width: int = WIDTH
    heads: int = HEADS
    mlp_dim: int = MLP_DIM

    @nn.compact
    def __call__(self, x):
        for j in range(self.blocks):
            x = EncoderBlock(dtype=self.dtype, width=self.width,
                             heads=self.heads, mlp_dim=self.mlp_dim,
                             name=f"layers_{j}")(x)
        return x


class PipelinedEncoderStack(nn.Module):
    """``stages`` GPipe stages x (``layers // stages``) EncoderBlocks.

    The TPU-native scaling surface for towers deeper than one chip: params
    live stacked on a leading stage dim (param name ``stages``;
    parallel/sharding.param_spec shards it ``P("stage", ...)`` so each
    device holds exactly its stage's weights and momentum).  With a mesh
    carrying a ``stage`` axis the stack runs as a GPipe pipeline —
    activations hop stage -> stage+1 over ICI via ppermute,
    ``n_micro`` microbatches in flight (parallel/pipeline.pipeline_apply,
    equivalence-tested vs sequential in tests/test_pipeline.py).  Without
    one (``mesh=None``, or during ``init``) it runs the mathematically
    identical sequential ``lax.scan``.

    The reference is single-GPU (SURVEY §2.4) so there is nothing to cite;
    config surface: ``mesh_shape: {data: D, stage: S}`` +
    ``pipeline_stages: S`` (+ optional ``pipeline_microbatches``).
    """

    layers: int
    stages: int
    dtype: Optional[Any] = None
    width: int = WIDTH
    heads: int = HEADS
    mlp_dim: int = MLP_DIM
    mesh: Any = None
    n_micro: int = 4

    @nn.compact
    def __call__(self, x):
        if self.layers % self.stages:
            raise ValueError(
                f"layers {self.layers} not divisible by pipeline_stages "
                f"{self.stages}")
        block = _StageBlock(blocks=self.layers // self.stages,
                            dtype=self.dtype, width=self.width,
                            heads=self.heads, mlp_dim=self.mlp_dim)

        def init_stacked(rng):
            import jax

            keys = jax.random.split(rng, self.stages)
            zeros = jnp.zeros((1,) + x.shape[1:], jnp.float32)
            trees = [block.init(k, zeros)["params"] for k in keys]
            return jax.tree.map(lambda *leaves: jnp.stack(leaves), *trees)

        stacked = self.param("stages", init_stacked)

        def block_fn(p, xm):
            return block.apply({"params": p}, xm)

        import jax

        from ..parallel.mesh import DATA_AXIS, STAGE_AXIS

        shape = dict(self.mesh.shape) if self.mesh is not None else {}
        if (shape.get(STAGE_AXIS, 1) > 1 and not self.is_initializing()):
            from ..parallel.pipeline import pipeline_apply

            data_axis = DATA_AXIS if shape.get(DATA_AXIS, 1) > 1 else None
            return pipeline_apply(self.mesh, block_fn, stacked, x,
                                  n_micro=self.n_micro, axis=STAGE_AXIS,
                                  data_axis=data_axis)

        def body(h, p):
            return block_fn(p, h), None

        y, _ = jax.lax.scan(body, x, stacked)
        return y


def unstack_tower_layers(tower_params: dict) -> dict:
    """Inverse of ``stack_tower_layers``: a pipelined tower
    (``{"pipeline": {"stages": <stacked>}}``) back to the per-layer
    ``layers_0..layers_{L-1}`` loop layout (the layout HF/torch porting
    writes into)."""
    import jax

    stacked = tower_params["pipeline"]["stages"]
    stages = jax.tree.leaves(stacked)[0].shape[0]
    out = {k: v for k, v in tower_params.items() if k != "pipeline"}
    per = len(stacked)
    for s in range(stages):
        stage = jax.tree.map(lambda a, s=s: a[s], stacked)
        for j in range(per):
            out[f"layers_{s * per + j}"] = stage[f"layers_{j}"]
    return out


def stack_tower_layers(tower_params: dict, stages: int) -> dict:
    """Convert one tower's per-layer params (``layers_0..layers_{L-1}`` —
    the unpipelined loop layout, also what ``port_siglip_state_dict``
    produces from an HF checkpoint) into the PipelinedEncoderStack layout:
    ``{"pipeline": {"stages": <stacked>}}`` with every leaf gaining a
    leading S dim (stage s, block j <- layer s*(L/S)+j)."""
    import jax

    layer_keys = sorted((k for k in tower_params if k.startswith("layers_")),
                        key=lambda s: int(s.split("_")[1]))
    n_layers = len(layer_keys)
    if not n_layers or n_layers % stages:
        raise ValueError(
            f"{n_layers} layers not divisible by {stages} stages")
    per = n_layers // stages
    stage_trees = [
        {f"layers_{j}": tower_params[layer_keys[s * per + j]]
         for j in range(per)}
        for s in range(stages)
    ]
    out = {k: v for k, v in tower_params.items()
           if not k.startswith("layers_")}
    out["pipeline"] = {
        "stages": jax.tree.map(lambda *leaves: jnp.stack(leaves),
                               *stage_trees)
    }
    return out


class MAPHead(nn.Module):
    """SigLIP multihead-attention-pooling head: learned probe attends over
    the patch tokens, then LN + residual MLP."""

    dtype: Optional[Any] = None
    width: int = WIDTH
    heads: int = HEADS
    mlp_dim: int = MLP_DIM

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        probe = self.param("probe", nn.initializers.xavier_uniform(),
                           (1, 1, self.width), jnp.float32)
        probe = jnp.broadcast_to(probe.astype(x.dtype), (b, 1, self.width))
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, param_dtype=jnp.float32,
            name="attention")(probe, x)
        y = nn.LayerNorm(epsilon=1e-6, param_dtype=jnp.float32,
                         name="layernorm")(h)
        y2 = nn.Dense(self.mlp_dim, dtype=self.dtype, param_dtype=jnp.float32,
                      name="mlp_fc1")(y)
        y2 = _gelu_tanh(y2)
        y2 = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32,
                      name="mlp_fc2")(y2)
        return (h + y2)[:, 0, :]


class SigLIPVisionTower(nn.Module):
    dtype: Optional[Any] = None
    width: int = WIDTH
    layers: int = LAYERS
    heads: int = HEADS
    mlp_dim: int = MLP_DIM
    patch: int = PATCH
    image_size: int = IMAGE_SIZE
    # GPipe over a mesh 'stage' axis (PipelinedEncoderStack); 0 = off
    pipeline_stages: int = 0
    pipeline_microbatches: int = 4
    # sequence parallelism: patch dim sharded over the 'model' axis
    sequence_sharding: bool = False
    mesh: Any = None

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """pixels: (B, image_size, image_size, 3) -> (B, width)."""
        x = nn.Conv(self.width, (self.patch, self.patch),
                    strides=(self.patch, self.patch),
                    padding="VALID", dtype=self.dtype,
                    param_dtype=jnp.float32, name="patch_embedding")(pixels)
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.02),
                         (1, (self.image_size // self.patch) ** 2,
                          self.width), jnp.float32)
        x = x + pos.astype(x.dtype)
        x = _maybe_shard_sequence(x, self.mesh, self.sequence_sharding,
                                  self.is_initializing())
        if self.pipeline_stages > 1:
            x = PipelinedEncoderStack(
                layers=self.layers, stages=self.pipeline_stages,
                dtype=self.dtype, width=self.width, heads=self.heads,
                mlp_dim=self.mlp_dim, mesh=self.mesh,
                n_micro=self.pipeline_microbatches, name="pipeline")(x)
        else:
            for i in range(self.layers):
                x = EncoderBlock(dtype=self.dtype, width=self.width,
                                 heads=self.heads, mlp_dim=self.mlp_dim,
                                 name=f"layers_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, param_dtype=jnp.float32,
                         name="post_layernorm")(x)
        return MAPHead(dtype=self.dtype, width=self.width, heads=self.heads,
                       mlp_dim=self.mlp_dim, name="head")(x)


class SigLIPTextTower(nn.Module):
    dtype: Optional[Any] = None
    width: int = WIDTH
    layers: int = LAYERS
    heads: int = HEADS
    mlp_dim: int = MLP_DIM
    text_len: int = TEXT_LEN
    vocab: int = VOCAB
    pipeline_stages: int = 0
    pipeline_microbatches: int = 4
    sequence_sharding: bool = False
    mesh: Any = None

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        """token_ids: (B, text_len) int32 -> (B, width)."""
        x = nn.Embed(self.vocab, self.width, param_dtype=jnp.float32,
                     dtype=self.dtype, name="token_embedding")(token_ids)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (1, self.text_len, self.width), jnp.float32)
        x = x + pos[:, : x.shape[1], :].astype(x.dtype)
        x = _maybe_shard_sequence(x, self.mesh, self.sequence_sharding,
                                  self.is_initializing())
        if self.pipeline_stages > 1:
            x = PipelinedEncoderStack(
                layers=self.layers, stages=self.pipeline_stages,
                dtype=self.dtype, width=self.width, heads=self.heads,
                mlp_dim=self.mlp_dim, mesh=self.mesh,
                n_micro=self.pipeline_microbatches, name="pipeline")(x)
        else:
            for i in range(self.layers):
                x = EncoderBlock(dtype=self.dtype, width=self.width,
                                 heads=self.heads, mlp_dim=self.mlp_dim,
                                 name=f"layers_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, param_dtype=jnp.float32,
                         name="final_layer_norm")(x)
        pooled = x[:, -1, :]  # HF SiglipTextModel: last-token pooling
        return nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32,
                        name="head")(pooled)


class SigLIPModel(nn.Module):
    """Geometry fields default to siglip-base-patch16-224 (the reference's
    checkpoint); smaller settings exist for trajectory-parity tests against
    HF torch on tiny twins (tests/test_siglip_parity.py)."""

    dtype: Optional[Any] = None
    width: int = WIDTH
    layers: int = LAYERS
    heads: int = HEADS
    mlp_dim: int = MLP_DIM
    patch: int = PATCH
    image_size: int = IMAGE_SIZE
    text_len: int = TEXT_LEN
    vocab: int = VOCAB
    pipeline_stages: int = 0
    pipeline_microbatches: int = 4
    sequence_sharding: bool = False
    mesh: Any = None

    @nn.compact
    def __call__(self, token_ids, pixels, train: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        pp = dict(pipeline_stages=self.pipeline_stages,
                  pipeline_microbatches=self.pipeline_microbatches,
                  sequence_sharding=self.sequence_sharding,
                  mesh=self.mesh)
        text = SigLIPTextTower(
            dtype=self.dtype, width=self.width, layers=self.layers,
            heads=self.heads, mlp_dim=self.mlp_dim, text_len=self.text_len,
            vocab=self.vocab, name="text_model", **pp)(token_ids)
        image = SigLIPVisionTower(
            dtype=self.dtype, width=self.width, layers=self.layers,
            heads=self.heads, mlp_dim=self.mlp_dim, patch=self.patch,
            image_size=self.image_size, name="vision_model", **pp)(pixels)
        # HF SiglipModel.forward L2-normalizes both embeds; the reference's
        # MLP heads consume exactly these normalized outputs
        # (food101/joint_model.py:55-58)
        text = text / jnp.linalg.norm(text.astype(jnp.float32), axis=-1,
                                      keepdims=True)
        image = image / jnp.linalg.norm(image.astype(jnp.float32), axis=-1,
                                        keepdims=True)
        return text, image


# ---------------------------------------------------------------------------
# HF weight porting (local checkpoint only; gated)
# ---------------------------------------------------------------------------
def load_hf_siglip_params(checkpoint_path: str, params: dict) -> dict:
    """Port google/siglip-base-patch16-224 torch weights into ``params``.

    ``checkpoint_path`` points at an HF snapshot dir containing
    ``model.safetensors`` or ``pytorch_model.bin``.  Returns a new params
    tree with ported weights; raises on shape mismatch.
    """
    import os

    state = None
    st_path = os.path.join(checkpoint_path, "model.safetensors")
    bin_path = os.path.join(checkpoint_path, "pytorch_model.bin")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        state = load_file(st_path)
    elif os.path.exists(bin_path):
        import torch

        state = {k: v.numpy() for k, v in
                 torch.load(bin_path, map_location="cpu").items()}
    else:
        raise FileNotFoundError(f"no HF weights under {checkpoint_path}")
    return port_siglip_state_dict(state, params)


def port_siglip_state_dict(state: dict, params: dict, *,
                           width: int = WIDTH, heads: int = HEADS,
                           layers: int = LAYERS) -> dict:
    """Port an HF SiglipModel state_dict (tensor or numpy values) into the
    Flax parameter tree.  Also used for architecture- and trajectory-parity
    testing against a randomly initialized torch SiglipModel
    (tests/test_siglip_parity.py) — geometry kwargs cover tiny twins."""
    state = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else
                 np.asarray(v)) for k, v in state.items()}

    import copy

    new = copy.deepcopy(jnp_to_np(params))
    # pipelined towers (PipelinedEncoderStack) carry stage-stacked params;
    # port through the per-layer loop layout and restack at the end
    pipelined = {}
    for key in ("text_model", "vision_model"):
        if "pipeline" in new[key]:
            import jax

            pipelined[key] = jax.tree.leaves(
                new[key]["pipeline"]["stages"])[0].shape[0]
            new[key] = unstack_tower_layers(new[key])
    _port_tower(state, new["text_model"], "text_model.encoder", text=True,
                width=width, heads=heads, layers=layers)
    _port_tower(state, new["vision_model"], "vision_model.encoder",
                text=False, width=width, heads=heads, layers=layers)
    # embeddings + heads
    new["text_model"]["token_embedding"]["embedding"] = _g(
        state, "text_model.embeddings.token_embedding.weight")
    new["text_model"]["position_embedding"] = _g(
        state, "text_model.embeddings.position_embedding.weight")[None]
    new["text_model"]["final_layer_norm"]["scale"] = _g(
        state, "text_model.final_layer_norm.weight")
    new["text_model"]["final_layer_norm"]["bias"] = _g(
        state, "text_model.final_layer_norm.bias")
    new["text_model"]["head"]["kernel"] = _g(state, "text_model.head.weight").T
    new["text_model"]["head"]["bias"] = _g(state, "text_model.head.bias")

    pe = _g(state, "vision_model.embeddings.patch_embedding.weight")
    new["vision_model"]["patch_embedding"]["kernel"] = pe.transpose(2, 3, 1, 0)
    new["vision_model"]["patch_embedding"]["bias"] = _g(
        state, "vision_model.embeddings.patch_embedding.bias")
    new["vision_model"]["position_embedding"] = _g(
        state, "vision_model.embeddings.position_embedding.weight")[None]
    new["vision_model"]["post_layernorm"]["scale"] = _g(
        state, "vision_model.post_layernorm.weight")
    new["vision_model"]["post_layernorm"]["bias"] = _g(
        state, "vision_model.post_layernorm.bias")
    _port_map_head(state, new["vision_model"]["head"],
                   width=width, heads=heads)
    for key, stages in pipelined.items():
        new[key] = stack_tower_layers(new[key], stages)
    return new


def jnp_to_np(tree):
    import jax

    return jax.tree_util.tree_map(np.asarray, tree)


def _g(state, key):
    return np.asarray(state[key])


def _port_attn(state, dst, prefix, *, width=WIDTH, heads=HEADS):
    for hf_name, fl_name in (("q_proj", "query"), ("k_proj", "key"),
                             ("v_proj", "value"), ("out_proj", "out")):
        w = _g(state, f"{prefix}.{hf_name}.weight")
        b = _g(state, f"{prefix}.{hf_name}.bias")
        head_dim = width // heads
        if fl_name == "out":
            dst[fl_name]["kernel"] = w.T.reshape(heads, head_dim, width)
            dst[fl_name]["bias"] = b
        else:
            dst[fl_name]["kernel"] = w.T.reshape(width, heads, head_dim)
            dst[fl_name]["bias"] = b.reshape(heads, head_dim)


def _port_tower(state, dst, prefix, text: bool, *,
                width=WIDTH, heads=HEADS, layers=LAYERS):
    for i in range(layers):
        blk = dst[f"layers_{i}"]
        p = f"{prefix}.layers.{i}"
        for ln in ("layer_norm1", "layer_norm2"):
            blk[ln]["scale"] = _g(state, f"{p}.{ln}.weight")
            blk[ln]["bias"] = _g(state, f"{p}.{ln}.bias")
        _port_attn(state, blk["self_attn"], f"{p}.self_attn",
                   width=width, heads=heads)
        blk["mlp_fc1"]["kernel"] = _g(state, f"{p}.mlp.fc1.weight").T
        blk["mlp_fc1"]["bias"] = _g(state, f"{p}.mlp.fc1.bias")
        blk["mlp_fc2"]["kernel"] = _g(state, f"{p}.mlp.fc2.weight").T
        blk["mlp_fc2"]["bias"] = _g(state, f"{p}.mlp.fc2.bias")


def _port_map_head(state, dst, *, width=WIDTH, heads=HEADS):
    p = "vision_model.head"
    dst["probe"] = _g(state, f"{p}.probe")
    head_dim = width // heads
    # HF MAP head uses torch nn.MultiheadAttention (packed in_proj)
    in_w = _g(state, f"{p}.attention.in_proj_weight")
    in_b = _g(state, f"{p}.attention.in_proj_bias")
    qw, kw, vw = np.split(in_w, 3, axis=0)
    qb, kb, vb = np.split(in_b, 3, axis=0)
    for name, w, b in (("query", qw, qb), ("key", kw, kb), ("value", vw, vb)):
        dst["attention"][name]["kernel"] = w.T.reshape(width, heads, head_dim)
        dst["attention"][name]["bias"] = b.reshape(heads, head_dim)
    ow = _g(state, f"{p}.attention.out_proj.weight")
    dst["attention"]["out"]["kernel"] = ow.T.reshape(heads, head_dim, width)
    dst["attention"]["out"]["bias"] = _g(state, f"{p}.attention.out_proj.bias")
    dst["layernorm"]["scale"] = _g(state, f"{p}.layernorm.weight")
    dst["layernorm"]["bias"] = _g(state, f"{p}.layernorm.bias")
    dst["mlp_fc1"]["kernel"] = _g(state, f"{p}.mlp.fc1.weight").T
    dst["mlp_fc1"]["bias"] = _g(state, f"{p}.mlp.fc1.bias")
    dst["mlp_fc2"]["kernel"] = _g(state, f"{p}.mlp.fc2.weight").T
    dst["mlp_fc2"]["bias"] = _g(state, f"{p}.mlp.fc2.bias")
