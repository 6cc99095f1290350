"""PyTorch checkpoint -> JAX parameter conversion.

Maps the reference's `torch.save` state dict (/root/reference/training.py:
498-519, model layout in /root/reference/model.py) onto our flax variable
tree, handling the layout differences:

  * Linear weight (out, in)        -> Dense kernel (in, out)
  * Conv2d weight (o, i, kh, kw)   -> Conv kernel (kh, kw, i, o)
  * NCHW flatten/unflatten indices -> NHWC permutations around the CNN
    encoder/decoder inner Linears
  * BatchNorm weight/bias/running_* -> scale/bias + batch_stats mean/var
  * RGCNConv weight/root/bias      -> GCLParams rel_weight/root/bias (same
    (in, out) orientation; no transpose)

Works on plain numpy arrays; no torch import needed unless reading a torch
pickle file (load_torch_checkpoint).
"""
from __future__ import annotations

from typing import Mapping

import numpy as np

from .config import ModelConfig


def _lin(sd, name):
    return {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].T),
            "bias": np.asarray(sd[f"{name}.bias"])}


def _conv(sd, name):
    w = np.asarray(sd[f"{name}.weight"])  # (o, i, kh, kw)
    return {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
            "bias": np.asarray(sd[f"{name}.bias"])}


def _bn(sd, name):
    params = {"scale": np.asarray(sd[f"{name}.weight"]),
              "bias": np.asarray(sd[f"{name}.bias"])}
    stats = {"mean": np.asarray(sd[f"{name}.running_mean"]),
             "var": np.asarray(sd[f"{name}.running_var"])}
    return params, stats


def _cnn_encoder(sd, pfx, batch_norm, p, s):
    """CNNEncoder (reference model.py:211-256). Sequential indices depend on
    batch_norm: [Conv,BN,ReLU,Pool,Conv,BN,ReLU] vs [Conv,ReLU,Pool,Conv,ReLU].
    """
    c0, c1 = ("0", "4") if batch_norm else ("0", "3")
    p["conv0"] = _conv(sd, f"{pfx}.conv.{c0}")
    p["conv1"] = _conv(sd, f"{pfx}.conv.{c1}")
    if batch_norm:
        p["bn0"], s["bn0"] = _bn(sd, f"{pfx}.conv.1")
        p["bn1"], s["bn1"] = _bn(sd, f"{pfx}.conv.5")
    # lin.1: Linear(16*4*8 -> dense). Torch input flatten order (c,h,w);
    # ours (h,w,c).
    w = np.asarray(sd[f"{pfx}.lin.1.weight"])  # (dense, 16*4*8)
    dense = w.shape[0]
    kernel = w.reshape(dense, 16, 4, 8).transpose(2, 3, 1, 0).reshape(-1, dense)
    p["lin0"] = {"kernel": np.ascontiguousarray(kernel),
                 "bias": np.asarray(sd[f"{pfx}.lin.1.bias"])}
    p["lin1"] = _lin(sd, f"{pfx}.lin.4")


def _cnn_decoder(sd, pfx, batch_norm, p, s):
    """CNNDecoder (reference model.py:259-299)."""
    p["lin0"] = _lin(sd, f"{pfx}.lin.1")
    # lin.4: Linear(dense -> 16*4*8); torch output rows ordered (c,h,w),
    # ours (h,w,c).
    w = np.asarray(sd[f"{pfx}.lin.4.weight"])  # (16*4*8, dense)
    dense = w.shape[1]
    kernel = w.reshape(16, 4, 8, dense).transpose(3, 1, 2, 0).reshape(dense, -1)
    b = np.asarray(sd[f"{pfx}.lin.4.bias"]).reshape(16, 4, 8)
    p["lin1"] = {"kernel": np.ascontiguousarray(kernel),
                 "bias": np.ascontiguousarray(b.transpose(1, 2, 0).reshape(-1))}
    c0, c1 = ("1", "4") if batch_norm else ("1", "3")
    p["conv0"] = _conv(sd, f"{pfx}.conv.{c0}")
    p["conv1"] = _conv(sd, f"{pfx}.conv.{c1}")
    if batch_norm:
        p["bn0"], s["bn0"] = _bn(sd, f"{pfx}.conv.2")


def _gcn(sd, pfx, n_layers, batch_norm, p, s):
    """GCN stack (reference model.py:167-208). The shared edge_nn appears
    under every layer in the torch state dict; read it once from layer 0."""
    p["edge_nn"] = _lin(sd, f"{pfx}.layers.0.nn")
    for i in range(n_layers):
        p[f"layers_{i}"] = {
            "rel_weight": np.asarray(sd[f"{pfx}.layers.{i}.weight"]),
            "root": np.asarray(sd[f"{pfx}.layers.{i}.root"]),
            "bias": np.asarray(sd[f"{pfx}.layers.{i}.bias"]),
        }
        if batch_norm:
            p[f"norm_layers_{i}"], s[f"norm_layers_{i}"] = _bn(
                sd, f"{pfx}.norm_layers.{i}.module")


def convert_state_dict(sd: Mapping[str, np.ndarray], cfg: ModelConfig):
    """Reference VAE state dict -> {'params': ..., 'batch_stats': ...}."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    bn = cfg.batch_norm
    params: dict = {"encoder": {}, "decoder": {}}
    stats: dict = {"encoder": {}, "decoder": {}}

    # --- Encoder / StructureEncoder ---------------------------------------
    se_p, se_s = {}, {}
    se_p["cnn_encoder"], se_s["cnn_encoder"] = {}, {}
    _cnn_encoder(sd, "encoder.s_encoder.cnn_encoder", bn,
                 se_p["cnn_encoder"], se_s["cnn_encoder"])
    se_p["bars_encoder"] = _lin(sd, "encoder.s_encoder.bars_encoder")
    params["encoder"]["s_encoder"] = se_p
    stats["encoder"]["s_encoder"] = se_s

    # --- Encoder / ContentEncoder ------------------------------------------
    ce_p, ce_s = {}, {}
    for n in ("drums_pitch_emb", "non_drums_pitch_emb", "dur_emb",
              "chord_encoder", "bars_encoder"):
        ce_p[n] = _lin(sd, f"encoder.c_encoder.{n}")
    for ours, theirs in (("bn_drums", "bn_drums"),
                         ("bn_non_drums", "bn_non_drums"),
                         ("bn_dur", "bn_dur")):
        ce_p[ours], ce_s[ours] = _bn(sd, f"encoder.c_encoder.{theirs}")
    ce_p["graph_encoder"], ce_s["graph_encoder"] = {}, {}
    _gcn(sd, "encoder.c_encoder.graph_encoder", cfg.gnn_n_layers, bn,
         ce_p["graph_encoder"], ce_s["graph_encoder"])
    ce_p["gate_mlp"] = {"layers_0": _lin(
        sd, "encoder.c_encoder.graph_attention.gate_nn.0.layers.0")}
    ce_p["gate_bn"], ce_s["gate_bn"] = _bn(
        sd, "encoder.c_encoder.graph_attention.gate_nn.1")
    params["encoder"]["c_encoder"] = ce_p
    stats["encoder"]["c_encoder"] = ce_s

    # --- Encoder head -------------------------------------------------------
    params["encoder"]["linear_merge"] = _lin(sd, "encoder.linear_merge")
    (params["encoder"]["bn_linear_merge"],
     stats["encoder"]["bn_linear_merge"]) = _bn(sd, "encoder.bn_linear_merge")
    params["encoder"]["linear_mu"] = _lin(sd, "encoder.linear_mu")
    params["encoder"]["linear_log_var"] = _lin(sd, "encoder.linear_log_var")

    # --- Decoder head --------------------------------------------------------
    params["decoder"]["lin_decoder"] = _lin(sd, "decoder.lin_decoder")
    (params["decoder"]["batch_norm"],
     stats["decoder"]["batch_norm"]) = _bn(sd, "decoder.batch_norm")

    # --- StructureDecoder ---------------------------------------------------
    sdn_p, sdn_s = {"cnn_decoder": {}}, {"cnn_decoder": {}}
    sdn_p["bars_decoder"] = _lin(sd, "decoder.s_decoder.bars_decoder")
    _cnn_decoder(sd, "decoder.s_decoder.cnn_decoder", bn,
                 sdn_p["cnn_decoder"], sdn_s["cnn_decoder"])
    params["decoder"]["s_decoder"] = sdn_p
    stats["decoder"]["s_decoder"] = sdn_s

    # --- ContentDecoder -------------------------------------------------------
    cd_p, cd_s = {}, {}
    for n in ("bars_decoder", "chord_decoder", "drums_pitch_emb",
              "non_drums_pitch_emb", "dur_emb"):
        cd_p[n] = _lin(sd, f"decoder.c_decoder.{n}")
    cd_p["graph_decoder"], cd_s["graph_decoder"] = {}, {}
    _gcn(sd, "decoder.c_decoder.graph_decoder", cfg.gnn_n_layers, bn,
         cd_p["graph_decoder"], cd_s["graph_decoder"])
    params["decoder"]["c_decoder"] = cd_p
    stats["decoder"]["c_decoder"] = cd_s

    def _prune(d):
        return {k: _prune(v) for k, v in d.items() if not isinstance(v, dict)
                or v} if isinstance(d, dict) else d

    return {"params": params, "batch_stats": _prune(stats)}


def load_torch_checkpoint(model_dir: str):
    """Read the reference's `checkpoint` + `configuration` files
    (/root/reference/generate.py:101-114). Requires torch (CPU)."""
    import os

    import torch

    ckpt = torch.load(os.path.join(model_dir, "checkpoint"),
                      map_location="cpu", weights_only=False)
    conf = torch.load(os.path.join(model_dir, "configuration"),
                      map_location="cpu", weights_only=False)
    sd = {k: v.detach().numpy() for k, v in ckpt["model_state_dict"].items()}
    from .config import train_config_from_dict

    cfg = train_config_from_dict(conf)
    return sd, cfg


def convert_torch_model_dir(model_dir: str):
    sd, cfg = load_torch_checkpoint(model_dir)
    return convert_state_dict(sd, cfg.model), cfg
