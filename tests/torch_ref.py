"""Torch-based eval-mode oracle of the reference VAE.

A functional re-implementation of /root/reference/model.py semantics (sparse
node sets, per-relation mean-aggregated message passing, PyG-style pooling)
driven directly by a reference-layout state dict. Used only in tests, to
validate the converter + dense JAX model end to end. Written from the spec;
the structure (pure functions over a state-dict) is deliberately different
from the reference's nn.Module tree.
"""
from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

from . import oracle

N_TRACKS = 4
N_PITCH = 131
N_DUR = 99
MAX_SIMU = 16


# ----------------------------------------------------------------------------- helpers
def lin(sd, k, x):
    return x @ sd[f"{k}.weight"].T + sd[f"{k}.bias"]


def bn_eval(sd, k, x):
    """BatchNorm eval over the last dim."""
    rm, rv = sd[f"{k}.running_mean"], sd[f"{k}.running_var"]
    w, b = sd[f"{k}.weight"], sd[f"{k}.bias"]
    return (x - rm) / torch.sqrt(rv + 1e-5) * w + b


def bn2d_eval(sd, k, x):
    return F.batch_norm(x, sd[f"{k}.running_mean"], sd[f"{k}.running_var"],
                        sd[f"{k}.weight"], sd[f"{k}.bias"], training=False)


# ------------------------------------------------------------------- state dict factory
def random_state_dict(cfg, seed=0):
    """Random reference-layout state dict for ModelConfig cfg (batch_norm on
    or off), float32 torch tensors."""
    g = torch.Generator().manual_seed(seed)
    d, nb, nl = cfg.d, cfg.n_bars, cfg.gnn_n_layers
    h = d // 2
    sd = {}

    def t(*shape, scale=None):
        x = torch.randn(*shape, generator=g)
        fan_in = shape[-1] if len(shape) > 1 else shape[0]
        return x * (scale if scale is not None else fan_in ** -0.5)

    def add_lin(k, out_f, in_f):
        sd[f"{k}.weight"] = t(out_f, in_f)
        sd[f"{k}.bias"] = t(out_f, scale=0.1)

    def add_bn(k, f):
        sd[f"{k}.weight"] = 1.0 + 0.1 * torch.randn(f, generator=g)
        sd[f"{k}.bias"] = 0.1 * torch.randn(f, generator=g)
        sd[f"{k}.running_mean"] = 0.1 * torch.randn(f, generator=g)
        sd[f"{k}.running_var"] = (1.0 + 0.1 * torch.randn(f, generator=g)).abs()

    def add_conv(k, o, i):
        sd[f"{k}.weight"] = t(o, i, 3, 3, scale=(i * 9) ** -0.5)
        sd[f"{k}.bias"] = t(o, scale=0.1)

    def add_cnn_encoder(pfx):
        if cfg.batch_norm:
            add_conv(f"{pfx}.conv.0", 8, 1); add_bn(f"{pfx}.conv.1", 8)
            add_conv(f"{pfx}.conv.4", 16, 8); add_bn(f"{pfx}.conv.5", 16)
        else:
            add_conv(f"{pfx}.conv.0", 8, 1)
            add_conv(f"{pfx}.conv.3", 16, 8)
        add_lin(f"{pfx}.lin.1", d, 16 * 4 * (cfg.n_timesteps // 4))
        add_lin(f"{pfx}.lin.4", d, d)

    def add_cnn_decoder(pfx):
        add_lin(f"{pfx}.lin.1", d, d)
        add_lin(f"{pfx}.lin.4", 16 * 4 * (cfg.n_timesteps // 4), d)
        if cfg.batch_norm:
            add_conv(f"{pfx}.conv.1", 8, 16); add_bn(f"{pfx}.conv.2", 8)
            add_conv(f"{pfx}.conv.4", 1, 8)
        else:
            add_conv(f"{pfx}.conv.1", 8, 16)
            add_conv(f"{pfx}.conv.3", 1, 8)

    def add_gcn(pfx):
        enn_w, enn_b = t(d, cfg.n_timesteps), t(d, scale=0.1)
        for i in range(nl):
            sd[f"{pfx}.layers.{i}.weight"] = t(6, d, d, scale=d ** -0.5)
            sd[f"{pfx}.layers.{i}.root"] = t(d, d, scale=d ** -0.5)
            sd[f"{pfx}.layers.{i}.bias"] = t(d, scale=0.1)
            sd[f"{pfx}.layers.{i}.nn.weight"] = enn_w
            sd[f"{pfx}.layers.{i}.nn.bias"] = enn_b
            if cfg.batch_norm:
                add_bn(f"{pfx}.norm_layers.{i}.module", d)

    add_cnn_encoder("encoder.s_encoder.cnn_encoder")
    add_lin("encoder.s_encoder.bars_encoder", d, nb * d)
    add_lin("encoder.c_encoder.non_drums_pitch_emb", h, N_PITCH)
    add_lin("encoder.c_encoder.drums_pitch_emb", h, N_PITCH)
    add_lin("encoder.c_encoder.dur_emb", h, N_DUR)
    add_bn("encoder.c_encoder.bn_non_drums", h)
    add_bn("encoder.c_encoder.bn_drums", h)
    add_bn("encoder.c_encoder.bn_dur", h)
    add_lin("encoder.c_encoder.chord_encoder", d, (MAX_SIMU - 1) * d)
    add_gcn("encoder.c_encoder.graph_encoder")
    add_lin("encoder.c_encoder.graph_attention.gate_nn.0.layers.0", 1, d)
    add_bn("encoder.c_encoder.graph_attention.gate_nn.1", 1)
    add_lin("encoder.c_encoder.bars_encoder", d, nb * d)
    add_lin("encoder.linear_merge", d, 2 * d)
    add_bn("encoder.bn_linear_merge", d)
    add_lin("encoder.linear_mu", d, d)
    add_lin("encoder.linear_log_var", d, d)

    add_lin("decoder.lin_decoder", 2 * d, d)
    add_bn("decoder.batch_norm", 2 * d)
    add_lin("decoder.s_decoder.bars_decoder", nb * d, d)
    add_cnn_decoder("decoder.s_decoder.cnn_decoder")
    add_lin("decoder.c_decoder.bars_decoder", nb * d, d)
    add_gcn("decoder.c_decoder.graph_decoder")
    add_lin("decoder.c_decoder.chord_decoder", (MAX_SIMU - 1) * d, d)
    add_lin("decoder.c_decoder.drums_pitch_emb", N_PITCH, h)
    add_lin("decoder.c_decoder.non_drums_pitch_emb", N_PITCH, h)
    add_lin("decoder.c_decoder.dur_emb", N_DUR, h)
    return sd


# ------------------------------------------------------------------------ CNN blocks
def cnn_encoder(sd, pfx, x, batch_norm):
    """x: (N, 1, T, S) -> (N, d)."""
    if batch_norm:
        x = F.conv2d(x, sd[f"{pfx}.conv.0.weight"], sd[f"{pfx}.conv.0.bias"],
                     padding=1)
        x = F.relu(bn2d_eval(sd, f"{pfx}.conv.1", x))
        x = F.max_pool2d(x, (1, 4), stride=(1, 4))
        x = F.conv2d(x, sd[f"{pfx}.conv.4.weight"], sd[f"{pfx}.conv.4.bias"],
                     padding=1)
        x = F.relu(bn2d_eval(sd, f"{pfx}.conv.5", x))
    else:
        x = F.relu(F.conv2d(x, sd[f"{pfx}.conv.0.weight"],
                            sd[f"{pfx}.conv.0.bias"], padding=1))
        x = F.max_pool2d(x, (1, 4), stride=(1, 4))
        x = F.relu(F.conv2d(x, sd[f"{pfx}.conv.3.weight"],
                            sd[f"{pfx}.conv.3.bias"], padding=1))
    x = x.flatten(1)
    x = F.relu(lin(sd, f"{pfx}.lin.1", x))
    return lin(sd, f"{pfx}.lin.4", x)


def cnn_decoder(sd, pfx, x, batch_norm, n_timesteps):
    """x: (N, d) -> (N, T, S) logits."""
    x = F.relu(lin(sd, f"{pfx}.lin.1", x))
    x = F.relu(lin(sd, f"{pfx}.lin.4", x))
    x = x.reshape(-1, 16, 4, n_timesteps // 4)
    x = F.interpolate(x, scale_factor=(1, 4), mode="nearest")
    c0, c1 = ("1", "4") if batch_norm else ("1", "3")
    x = F.conv2d(x, sd[f"{pfx}.conv.{c0}.weight"], sd[f"{pfx}.conv.{c0}.bias"],
                 padding=1)
    if batch_norm:
        x = bn2d_eval(sd, f"{pfx}.conv.2", x)
    x = F.relu(x)
    x = F.conv2d(x, sd[f"{pfx}.conv.{c1}.weight"], sd[f"{pfx}.conv.{c1}.bias"],
                 padding=1)
    return x[:, 0]


# ---------------------------------------------------------------------- graph blocks
def gcl_sparse(sd, pfx, i, x, edges, gate_table):
    """Reference GCL forward (model.py:101-135), eval mode."""
    n = x.shape[0]
    w = sd[f"{pfx}.layers.{i}.weight"]
    out = x @ sd[f"{pfx}.layers.{i}.root"] + sd[f"{pfx}.layers.{i}.bias"]
    for r in range(w.shape[0]):
        acc = torch.zeros_like(x)
        cnt = torch.zeros(n, dtype=torch.long)
        for (u, v, rel, dist) in edges:
            if rel != r:
                continue
            acc[v] += F.relu(x[u] * gate_table[dist])
            cnt[v] += 1
        h = torch.where(cnt[:, None] > 0, acc / cnt[:, None].clamp(min=1),
                        torch.zeros(()))
        out = out + h @ w[r]
    return out


def gcn(sd, pfx, x, edges, n_layers, batch_norm):
    gate_table = (sd[f"{pfx}.layers.0.nn.weight"].T
                  + sd[f"{pfx}.layers.0.nn.bias"])
    for i in range(n_layers):
        residual = x
        x = gcl_sparse(sd, pfx, i, x, edges, gate_table)
        if batch_norm:
            x = bn_eval(sd, f"{pfx}.norm_layers.{i}.module", x)
        x = residual + F.relu(x)
    return x


def sample_edges(mask_bars):
    """Edges of one sample (n_bars, T, S) with node offsets per bar; returns
    (edges, coords) where coords[i] = (bar, track, step) of node i."""
    edges, coords = [], []
    offset = 0
    for b in range(mask_bars.shape[0]):
        bar = mask_bars[b]
        e, nodes = oracle.bar_edges(bar)
        edges.extend([(u + offset, v + offset, r, dd) for (u, v, r, dd) in e])
        coords.extend([(b, t, s) for (t, s) in nodes])
        offset += len(nodes)
    return edges, coords


# --------------------------------------------------------------------------- encoder
def content_encoder(sd, cfg, tokens, mask):
    """tokens: (nb, T, S, 16, 2) int64; mask: (nb, T, S) bool (one sample).
    Returns z_c (d,)."""
    pfx = "encoder.c_encoder"
    d, h = cfg.d, cfg.d // 2
    edges, coords = sample_edges(mask)
    ids = np.array(
        [tokens[b, t, s] for (b, t, s) in coords])  # (n, 16, 2)
    ids = torch.from_numpy(ids)[:, 1:, :]  # drop SOS slot
    onehot_p = F.one_hot(ids[..., 0], N_PITCH).float()
    onehot_d = F.one_hot(ids[..., 1], N_DUR).float()
    is_drum = torch.tensor([t == 0 for (_, t, _) in coords])

    def embed(rows_p, rows_d, which):
        p = lin(sd, f"{pfx}.{which}_pitch_emb", rows_p)
        p = bn_eval(sd, f"{pfx}.bn_{which}", p)
        dd = lin(sd, f"{pfx}.dur_emb", rows_d)
        dd = bn_eval(sd, f"{pfx}.bn_dur", dd)
        return torch.cat([p, dd], dim=-1)

    emb = torch.zeros(ids.shape[0], MAX_SIMU - 1, d)
    emb[is_drum] = embed(onehot_p[is_drum], onehot_d[is_drum], "drums")
    emb[~is_drum] = embed(onehot_p[~is_drum], onehot_d[~is_drum], "non_drums")

    x = F.relu(lin(sd, f"{pfx}.chord_encoder",
                   emb.reshape(-1, (MAX_SIMU - 1) * d)))
    x = gcn(sd, f"{pfx}.graph_encoder", x, edges, cfg.gnn_n_layers,
            cfg.batch_norm)

    # GlobalAttention per bar
    gate = bn_eval(sd, f"{pfx}.graph_attention.gate_nn.1",
                   lin(sd, f"{pfx}.graph_attention.gate_nn.0.layers.0", x))
    bars = torch.tensor([b for (b, _, _) in coords])
    pooled = torch.zeros(cfg.n_bars, d)
    for b in range(cfg.n_bars):
        sel = bars == b
        w = torch.softmax(gate[sel, 0], dim=0)
        pooled[b] = (w[:, None] * x[sel]).sum(0)
    return lin(sd, f"{pfx}.bars_encoder", pooled.reshape(-1))


def encode(sd, cfg, tokens, mask):
    """Batch eval encoder. tokens (B, nb, T, S, 16, 2) np.int64;
    mask (B, nb, T, S) bool (already non-empty-fixed). Returns mu, log_var."""
    b = mask.shape[0]
    s_in = torch.from_numpy(mask.astype(np.float32)).reshape(
        b * cfg.n_bars, 1, N_TRACKS, cfg.n_timesteps)
    z_s = cnn_encoder(sd, "encoder.s_encoder.cnn_encoder", s_in,
                      cfg.batch_norm)
    z_s = lin(sd, "encoder.s_encoder.bars_encoder",
              z_s.reshape(b, cfg.n_bars * cfg.d))
    z_c = torch.stack([
        content_encoder(sd, cfg, tokens[i], mask[i]) for i in range(b)])
    z_g = torch.cat([z_c, z_s], dim=1)
    z_g = F.relu(bn_eval(sd, "encoder.bn_linear_merge",
                         lin(sd, "encoder.linear_merge", z_g)))
    return (lin(sd, "encoder.linear_mu", z_g),
            lin(sd, "encoder.linear_log_var", z_g))


# --------------------------------------------------------------------------- decoder
def content_decoder(sd, cfg, z_c, mask):
    """z_c (B, d); mask (B, nb, T, S) bool. Returns dense c_logits
    (B, nb, T, S, 15, 230) with zeros at inactive cells."""
    pfx = "decoder.c_decoder"
    d, h = cfg.d, cfg.d // 2
    bsz = z_c.shape[0]
    z_bars = lin(sd, f"{pfx}.bars_decoder", z_c).reshape(bsz, cfg.n_bars, d)
    out = np.zeros((bsz, cfg.n_bars, N_TRACKS, cfg.n_timesteps,
                    MAX_SIMU - 1, N_PITCH + N_DUR), np.float32)
    for i in range(bsz):
        edges, coords = sample_edges(mask[i])
        x = torch.stack([z_bars[i, b] for (b, _, _) in coords])
        x = gcn(sd, f"{pfx}.graph_decoder", x, edges, cfg.gnn_n_layers,
                cfg.batch_norm)
        x = lin(sd, f"{pfx}.chord_decoder", x).reshape(-1, MAX_SIMU - 1, d)
        is_drum = torch.tensor([t == 0 for (_, t, _) in coords])
        res = torch.zeros(x.shape[0], MAX_SIMU - 1, N_PITCH + N_DUR)
        for sel, which in ((is_drum, "drums"), (~is_drum, "non_drums")):
            half = x[sel]
            p = lin(sd, f"{pfx}.{which}_pitch_emb", half[..., :h])
            dd = lin(sd, f"{pfx}.dur_emb", half[..., h:])
            res[sel] = torch.cat([p, dd], dim=-1)
        for n, (b, t, s) in enumerate(coords):
            out[i, b, t, s] = res[n].numpy()
    return out


def decode(sd, cfg, z, mask=None):
    """Eval decoder pass. z (B, d) torch. Returns (s_logits, c_logits, mask)."""
    z = F.relu(bn_eval(sd, "decoder.batch_norm",
                       lin(sd, "decoder.lin_decoder", z)))
    z_s, z_c = z[:, :cfg.d], z[:, cfg.d:]
    b = z.shape[0]
    out = lin(sd, "decoder.s_decoder.bars_decoder", z_s).reshape(-1, cfg.d)
    s_logits = cnn_decoder(sd, "decoder.s_decoder.cnn_decoder", out,
                           cfg.batch_norm, cfg.n_timesteps)
    s_logits = s_logits.reshape(b, cfg.n_bars, N_TRACKS, cfg.n_timesteps)
    if mask is None:
        m = (torch.sigmoid(s_logits) >= 0.5).numpy()
        for i in range(b):
            for bb in range(cfg.n_bars):
                if not m[i, bb].any():
                    m[i, bb, 0, 0] = True
        mask = m
    c_logits = content_decoder(sd, cfg, z_c, mask)
    return s_logits.numpy(), c_logits, mask
