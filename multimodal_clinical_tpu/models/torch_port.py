"""Torch -> Flax weight porting for the backbone zoo.

Serves two purposes:
  1. loading real pretrained torchvision / reference checkpoints from LOCAL
     files (zero-egress environments can't download; the reference downloads
     ImageNet weights at construction, enrico/joint_model.py:28);
  2. numerical parity testing — a randomly-initialized torch module's
     state_dict is ported and both forwards are compared (tests/
     test_torch_parity.py), pinning this framework's backbones to the
     reference's math.

Layout conventions: torch conv (O, I, H, W) -> flax (H, W, I, O); linear
(O, I) -> (I, O); BatchNorm weight/bias -> scale/bias and running stats ->
the ``batch_stats`` collection.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv(w) -> np.ndarray:
    return np.asarray(w).transpose(2, 3, 1, 0)


def _lin(w) -> np.ndarray:
    return np.asarray(w).T


def _to_np(state_dict) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state_dict.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def port_resnet_encoder(
    state_dict,
    torch_prefix: str = "",
    stage_sizes=(2, 2, 2, 2),
) -> Tuple[dict, dict]:
    """Port a torchvision-style/reference-style BasicBlock ResNet into the
    ResNetEncoder tree.  Returns (params, batch_stats).

    Both torchvision resnet18 and the reference's scratch ResNet
    (cremad/backbone.py) use the names conv1/bn1/layer{1..4}.{b}.conv{1,2}/
    bn{1,2}/downsample.{0,1}, so one mapping covers both.
    """
    sd = _to_np(state_dict)
    p = torch_prefix
    params: dict = {}
    stats: dict = {}

    def bn(dst_p: dict, dst_s: dict, key: str, tkey: str):
        dst_p[key] = {"BatchNorm_0": {
            "scale": sd[tkey + ".weight"], "bias": sd[tkey + ".bias"]}}
        dst_s[key] = {"BatchNorm_0": {
            "mean": sd[tkey + ".running_mean"],
            "var": sd[tkey + ".running_var"]}}

    params["Conv_0"] = {"kernel": _conv(sd[p + "conv1.weight"])}
    bn(params, stats, "_BN_0", p + "bn1")

    blk = 0
    for stage, blocks in enumerate(stage_sizes):
        for b in range(blocks):
            t = f"{p}layer{stage + 1}.{b}"
            bp: dict = {}
            bs: dict = {}
            bp["Conv_0"] = {"kernel": _conv(sd[t + ".conv1.weight"])}
            bn(bp, bs, "_BN_0", t + ".bn1")
            bp["Conv_1"] = {"kernel": _conv(sd[t + ".conv2.weight"])}
            bn(bp, bs, "_BN_1", t + ".bn2")
            if t + ".downsample.0.weight" in sd:
                bp["Conv_2"] = {"kernel": _conv(sd[t + ".downsample.0.weight"])}
                bn(bp, bs, "_BN_2", t + ".downsample.1")
            params[f"BasicBlock_{blk}"] = bp
            stats[f"BasicBlock_{blk}"] = bs
            blk += 1
    return params, stats


def port_resnet18_slim(state_dict) -> Tuple[dict, dict]:
    """torchvision resnet18 (optionally with a trailing Linear classifier)
    -> ResNet18Slim tree {features, classifier}."""
    sd = _to_np(state_dict)
    feats_p, feats_s = port_resnet_encoder(sd)
    params = {"features": feats_p}
    stats = {"features": feats_s}
    if "fc.weight" in sd:
        params["classifier"] = {"Dense_0": {
            "kernel": _lin(sd["fc.weight"]), "bias": sd["fc.bias"]}}
    return params, stats


_VGG11_CONV_IDX = (0, 4, 8, 11, 15, 18, 22, 25)  # torchvision vgg11_bn features


def port_vgg11_slim(state_dict, with_dropout: bool = True
                    ) -> Tuple[dict, dict]:
    """torchvision vgg11_bn -> VGG11Slim tree.

    NOTE the flatten-order mismatch: torch flattens (C, 7, 7) C-major while
    the NHWC forward flattens (7, 7, C); the classifier kernel is permuted
    accordingly so logits match bit-for-bit in fp32.
    """
    sd = _to_np(state_dict)
    params: dict = {}
    stats: dict = {}
    for i, tidx in enumerate(_VGG11_CONV_IDX):
        params[f"Conv_{i}"] = {
            "kernel": _conv(sd[f"features.{tidx}.weight"]),
            "bias": sd[f"features.{tidx}.bias"],
        }
        params[f"TorchBatchNorm_{i}"] = {"BatchNorm_0": {
            "scale": sd[f"features.{tidx + 1}.weight"],
            "bias": sd[f"features.{tidx + 1}.bias"]}}
        stats[f"TorchBatchNorm_{i}"] = {"BatchNorm_0": {
            "mean": sd[f"features.{tidx + 1}.running_mean"],
            "var": sd[f"features.{tidx + 1}.running_var"]}}
    if "classifier.weight" in sd:
        w = np.asarray(sd["classifier.weight"])  # (hiddim, C*7*7) C-major
        hiddim = w.shape[0]
        # torch column index = c*49 + i*7 + j; NHWC row index = i*7*512
        # + j*512 + c  =>  (h, c, i, j) -> (i, j, c, h)
        w = w.reshape(hiddim, 512, 7, 7).transpose(2, 3, 1, 0)
        w = w.reshape(7 * 7 * 512, hiddim)
        params["classifier"] = {"Dense_0": {
            "kernel": w, "bias": sd["classifier.bias"]}}
    return params, stats


def port_lenet(state_dict, num_blocks: int, prefix: str = ""
               ) -> Tuple[dict, dict]:
    """Reference LeNet (avmnist/joint_model.py:32-97: convs.N / bns.N
    ModuleLists) -> LeNet tree."""
    sd = _to_np(state_dict)
    params: dict = {}
    stats: dict = {}
    for i in range(num_blocks):
        params[f"Conv_{i}"] = {"kernel": _conv(sd[f"{prefix}convs.{i}.weight"])}
        params[f"TorchBatchNorm_{i}"] = {"BatchNorm_0": {
            "scale": sd[f"{prefix}bns.{i}.weight"],
            "bias": sd[f"{prefix}bns.{i}.bias"]}}
        stats[f"TorchBatchNorm_{i}"] = {"BatchNorm_0": {
            "mean": sd[f"{prefix}bns.{i}.running_mean"],
            "var": sd[f"{prefix}bns.{i}.running_var"]}}
    return params, stats


def port_bottleneck_encoder(
    state_dict,
    torch_prefix: str = "",
    stage_sizes=(3, 4, 6, 3),
) -> Tuple[dict, dict]:
    """torchvision-style Bottleneck ResNet (resnet50/101/152) ->
    BottleneckResNetEncoder tree.  Names: conv1/bn1 stem, then
    layer{s}.{b}.conv{1,2,3}/bn{1,2,3}/downsample.{0,1}."""
    sd = _to_np(state_dict)
    p = torch_prefix
    params: dict = {}
    stats: dict = {}

    def bn(dst_p: dict, dst_s: dict, key: str, tkey: str):
        dst_p[key] = {"BatchNorm_0": {
            "scale": sd[tkey + ".weight"], "bias": sd[tkey + ".bias"]}}
        dst_s[key] = {"BatchNorm_0": {
            "mean": sd[tkey + ".running_mean"],
            "var": sd[tkey + ".running_var"]}}

    params["Conv_0"] = {"kernel": _conv(sd[p + "conv1.weight"])}
    bn(params, stats, "_BN_0", p + "bn1")

    blk = 0
    for stage, blocks in enumerate(stage_sizes):
        for b in range(blocks):
            t = f"{p}layer{stage + 1}.{b}"
            bp: dict = {}
            bs: dict = {}
            for i in range(3):
                bp[f"Conv_{i}"] = {
                    "kernel": _conv(sd[f"{t}.conv{i + 1}.weight"])}
                bn(bp, bs, f"_BN_{i}", f"{t}.bn{i + 1}")
            if f"{t}.downsample.0.weight" in sd:
                bp["Conv_3"] = {
                    "kernel": _conv(sd[t + ".downsample.0.weight"])}
                bn(bp, bs, "_BN_3", t + ".downsample.1")
            params[f"BottleneckBlock_{blk}"] = bp
            stats[f"BottleneckBlock_{blk}"] = bs
            blk += 1
    return params, stats


def port_bert(state_dict, torch_prefix: str = "", num_layers: int = 12,
              num_heads: int = 12) -> dict:
    """HF torch ``BertModel`` state_dict -> models/bert.py BertEncoder
    params.  Works with ``BertForTokenClassification`` checkpoints too
    (pass torch_prefix="bert.")."""
    sd = _to_np(state_dict)
    p = torch_prefix
    e = p + "embeddings."
    params: dict = {
        "word_embeddings": {
            "embedding": sd[e + "word_embeddings.weight"]},
        "position_embeddings": sd[e + "position_embeddings.weight"],
        "token_type_embeddings": sd[e + "token_type_embeddings.weight"],
        "embeddings_norm": {"scale": sd[e + "LayerNorm.weight"],
                            "bias": sd[e + "LayerNorm.bias"]},
    }
    width = params["word_embeddings"]["embedding"].shape[1]
    heads = num_heads
    head_dim = width // heads
    for i in range(num_layers):
        t = f"{p}encoder.layer.{i}."
        la: dict = {}

        def qkv(name):
            w = _lin(sd[t + f"attention.self.{name}.weight"])  # (W, W)
            b = sd[t + f"attention.self.{name}.bias"]
            return {"kernel": w.reshape(width, heads, head_dim),
                    "bias": b.reshape(heads, head_dim)}

        la["attention"] = {
            "query": qkv("query"),
            "key": qkv("key"),
            "value": qkv("value"),
            "out": {
                "kernel": _lin(sd[t + "attention.output.dense.weight"])
                .reshape(heads, head_dim, width),
                "bias": sd[t + "attention.output.dense.bias"],
            },
        }
        la["attention_norm"] = {
            "scale": sd[t + "attention.output.LayerNorm.weight"],
            "bias": sd[t + "attention.output.LayerNorm.bias"]}
        la["intermediate"] = {
            "kernel": _lin(sd[t + "intermediate.dense.weight"]),
            "bias": sd[t + "intermediate.dense.bias"]}
        la["output"] = {"kernel": _lin(sd[t + "output.dense.weight"]),
                        "bias": sd[t + "output.dense.bias"]}
        la["output_norm"] = {"scale": sd[t + "output.LayerNorm.weight"],
                             "bias": sd[t + "output.LayerNorm.bias"]}
        params[f"layer_{i}"] = la
    return params


def port_torch_linear(weight, bias=None) -> dict:
    out = {"kernel": _lin(np.asarray(weight))}
    if bias is not None:
        out["bias"] = np.asarray(bias)
    return {"Dense_0": out}


def port_lstm_cell(state_dict, prefix: str = "lstm.") -> dict:
    """torch nn.LSTM (1 layer) -> flax OptimizedLSTMCell params.

    torch packs weight_ih_l0 as [W_ii; W_if; W_ig; W_io] (4H, F) — the
    same i/f/g/o gate order flax uses.  flax's input Denses carry no
    bias, so both torch bias vectors fold into the h-side biases:
    ``h<g> bias <- b_i<g> + b_h<g>``.  Backs the MUsTARD LstmClassifier
    recurrence (mustard/joint_model.py:18,33-36)."""
    sd = _to_np(state_dict)
    w_ih = sd[prefix + "weight_ih_l0"]
    w_hh = sd[prefix + "weight_hh_l0"]
    b_ih = sd.get(prefix + "bias_ih_l0")
    b_hh = sd.get(prefix + "bias_hh_l0")
    h = w_hh.shape[1]
    wi = np.split(w_ih, 4, axis=0)
    wh = np.split(w_hh, 4, axis=0)
    bi = np.split(b_ih, 4) if b_ih is not None else (np.zeros(h),) * 4
    bh = np.split(b_hh, 4) if b_hh is not None else (np.zeros(h),) * 4
    out = {}
    for k, g in enumerate("ifgo"):
        out[f"i{g}"] = {"kernel": wi[k].T}
        out[f"h{g}"] = {"kernel": wh[k].T, "bias": bi[k] + bh[k]}
    return out


def port_lstm_classifier(state_dict, prefix: str = "") -> dict:
    """Reference LstmClassifier (mustard/joint_model.py:9-43) -> our
    models.rnn.LstmClassifier params (fc1/lstm/fc2/fc3 ->
    TorchDense_0/OptimizedLSTMCell_0/TorchDense_1/TorchDense_2)."""
    sd = _to_np(state_dict)

    def lin(name):
        return port_torch_linear(sd[prefix + name + ".weight"],
                                 sd.get(prefix + name + ".bias"))

    return {
        "TorchDense_0": lin("fc1"),
        "OptimizedLSTMCell_0": port_lstm_cell(sd, prefix=prefix + "lstm."),
        "TorchDense_1": lin("fc2"),
        "TorchDense_2": lin("fc3"),
    }


def port_gru_cell(state_dict, prefix: str = "gru.") -> dict:
    """torch nn.GRU (1 layer) -> flax GRUCell params.

    torch packs weight_ih_l0 as [W_ir; W_iz; W_in] (3H, F) and
    weight_hh_l0 as [W_hr; W_hz; W_hn]; flax GRUCell splits into
    ir/iz/in Dense(no bias... with bias on i) — flax GRUCell uses
    dense_i (ir, iz, in with bias) and dense_h (hr, hz, hn; hn carries
    bias).  Gate math matches torch only when both bias vectors are
    folded: flax hn bias <- b_hn, flax i* bias <- b_i* + b_h* for r/z.
    """
    sd = _to_np(state_dict)
    w_ih = sd[prefix + "weight_ih_l0"]
    w_hh = sd[prefix + "weight_hh_l0"]
    b_ih = sd.get(prefix + "bias_ih_l0")
    b_hh = sd.get(prefix + "bias_hh_l0")
    h = w_hh.shape[1]
    wir, wiz, win = np.split(w_ih, 3, axis=0)
    whr, whz, whn = np.split(w_hh, 3, axis=0)
    bir, biz, bin_ = (np.split(b_ih, 3) if b_ih is not None
                      else (np.zeros(h),) * 3)
    bhr, bhz, bhn = (np.split(b_hh, 3) if b_hh is not None
                     else (np.zeros(h),) * 3)
    return {
        "ir": {"kernel": wir.T, "bias": bir + bhr},
        "iz": {"kernel": wiz.T, "bias": biz + bhz},
        "in": {"kernel": win.T, "bias": bin_},
        "hr": {"kernel": whr.T},
        "hz": {"kernel": whz.T},
        "hn": {"kernel": whn.T, "bias": bhn},
    }
