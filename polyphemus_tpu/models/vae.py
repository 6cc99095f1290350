"""The Polyphemus VAE, dense TPU formulation (flax.linen).

Mirrors the reference architecture (/root/reference/model.py:302-678) module
for module, but every graph operation runs on the dense bar lattice
(ops/lattice.py) so the full encoder->sample->decoder pass — including
structure-to-graph construction during generation, which the reference does
on the CPU mid-forward (model.py:596-632) — is one jit region.

Data layout:
  tokens: (B, n_bars, T, S, MAX_SIMU_TOKENS, 2) int32 — (pitch, dur) ids.
  mask:   (B, n_bars, T, S) bool — the structure tensor.
  c_logits: (B, n_bars, T, S, MAX_SIMU_TOKENS-1, 230).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .. import constants
from ..config import ModelConfig
from ..ops import lattice
from ..ops import masked as mops
from .gnn import GCN
from .layers import MLP, CNNDecoder, CNNEncoder, MaskedBatchNorm


class EmbedLinear(nn.Module):
    """Token-id embedding equivalent to a Linear applied to a one-hot input
    (kernel lookup + bias), so reference Linear weights port directly."""

    vocab: int
    features: int

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.vocab, self.features))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,))

    def __call__(self, ids):
        # one-hot matmul instead of jnp.take: identical values, but the
        # backward becomes onehot^T @ g on the MXU instead of a scatter-add
        # into the table (profiled at 7.5 ms/step/table vs ~0.1 ms; TPU
        # scatters serialize). Vocab is small (99/131) so the forward
        # matmul is also cheap.
        oh = jax.nn.one_hot(ids, self.vocab, dtype=self.kernel.dtype)
        return oh @ self.kernel + self.bias

    def tables(self):
        return self.kernel, self.bias


class ContentEncoder(nn.Module):
    """Reference ContentEncoder (model.py:302-417), dense layout."""

    cfg: ModelConfig

    def _fused_front(self, cfg, pitch_ids, dur_ids, mask, deterministic,
                     drums_emb, nd_emb, dur_emb, bn_drums, bn_nd, bn_dur,
                     ck, cb):
        """Gather-fused embedding + BN + chord projection (see
        ops/fused_embed.py): exact masked-BN statistics from the embedding
        tables, BN affine + chord Linear folded into per-slot lookup
        tables — no (cells, slots, d) intermediates."""
        from ..ops import fused_embed as fe

        d, h = cfg.d, cfg.d // 2
        n_slots = constants.MAX_SIMU_TOKENS - 1
        pids_dr = pitch_ids[..., :1, :, :]
        pids_nd = pitch_ids[..., 1:, :, :]
        dids_dr = dur_ids[..., :1, :, :]
        dids_nd = dur_ids[..., 1:, :, :]
        m_dr = mask[..., :1, :]
        m_nd = mask[..., 1:, :]

        w_slots = ck.reshape(n_slots, d, d)
        w_p, w_d = w_slots[:, :h, :], w_slots[:, h:, :]

        def affine(bn, table, ebias, ids, cmask):
            if deterministic:
                mean, var = bn.running_stats()
                return bn.affine_from_stats(mean, var)
            st = fe.embedding_stats(table, ebias, ids, cmask)
            a, b = bn.affine_from_stats(st.mean, st.var)
            bn.update_running(st.mean, st.var, st.count)
            return a, b

        pk_d, pb_d = drums_emb.tables()
        pk_n, pb_n = nd_emb.tables()
        dk, db = dur_emb.tables()

        a_pd, b_pd = affine(bn_drums, pk_d, pb_d, pids_dr, m_dr)
        a_pn, b_pn = affine(bn_nd, pk_n, pb_n, pids_nd, m_nd)
        # shared dur BN: drums group first, then non-drums (running stats
        # chain in that order, like the reference)
        a_dd, b_dd = affine(bn_dur, dk, db, dids_dr, m_dr)
        a_dn, b_dn = affine(bn_dur, dk, db, dids_nd, m_nd)

        t_pd, c_pd = fe.fused_tables(pk_d, pb_d, a_pd, b_pd, w_p)
        t_pn, c_pn = fe.fused_tables(pk_n, pb_n, a_pn, b_pn, w_p)
        t_dd, c_dd = fe.fused_tables(dk, db, a_dd, b_dd, w_d)
        t_dn, c_dn = fe.fused_tables(dk, db, a_dn, b_dn, w_d)

        x_dr = (fe.gather_sum(t_pd, c_pd, pids_dr)
                + fe.gather_sum(t_dd, c_dd, dids_dr) + cb)
        x_nd = (fe.gather_sum(t_pn, c_pn, pids_nd)
                + fe.gather_sum(t_dn, c_dn, dids_nd) + cb)
        return jnp.concatenate([x_dr, x_nd], axis=-3).astype(ck.dtype)

    @nn.compact
    def __call__(self, tokens, mask, nbr, *, deterministic: bool):
        cfg = self.cfg
        d, h = cfg.d, cfg.d // 2
        n_slots = constants.MAX_SIMU_TOKENS - 1

        toks = tokens[..., 1:, :]  # drop SOS slot
        pitch_ids, dur_ids = toks[..., 0], toks[..., 1]

        # Separate drum/non-drum pitch embeddings; shared duration embedding.
        # Drums are statically row 0 of the track axis. The shared dur BN
        # runs drums first then non-drums, updating running stats twice in
        # that order (reference model.py:362, :375 share one bn_dur module).
        drums_emb = EmbedLinear(constants.N_PITCH_TOKENS, h,
                                name="drums_pitch_emb")
        nd_emb = EmbedLinear(constants.N_PITCH_TOKENS, h,
                             name="non_drums_pitch_emb")
        dur_emb = EmbedLinear(constants.N_DUR_TOKENS, h, name="dur_emb")
        bn_drums = MaskedBatchNorm(h, name="bn_drums")
        bn_nd = MaskedBatchNorm(h, name="bn_non_drums")
        bn_dur = MaskedBatchNorm(h, name="bn_dur")
        ck, cb = DenseParams(n_slots * d, d, name="chord_encoder")()

        if cfg.fused_content_encoder:
            x = self._fused_front(
                cfg, pitch_ids, dur_ids, mask, deterministic,
                drums_emb, nd_emb, dur_emb, bn_drums, bn_nd, bn_dur, ck, cb)
        else:
            drums_pitch = drums_emb(pitch_ids[..., :1, :, :])
            nd_pitch = nd_emb(pitch_ids[..., 1:, :, :])
            drums_dur = dur_emb(dur_ids[..., :1, :, :])
            nd_dur = dur_emb(dur_ids[..., 1:, :, :])

            m_drum = jnp.broadcast_to(mask[..., :1, :, None],
                                      drums_pitch.shape[:-1])
            m_nd = jnp.broadcast_to(mask[..., 1:, :, None],
                                    nd_pitch.shape[:-1])
            drums_pitch = bn_drums(drums_pitch, m_drum,
                                   use_running_average=deterministic)
            nd_pitch = bn_nd(nd_pitch, m_nd,
                             use_running_average=deterministic)
            drums_dur = bn_dur(drums_dur, m_drum,
                               use_running_average=deterministic)
            nd_dur = bn_dur(nd_dur, m_nd, use_running_average=deterministic)

            # Split the chord projection into its pitch-row and dur-row
            # blocks instead of concatenating [pitch;dur] per slot: the
            # interleaved (..., 15, d) tensor (and its backward reshapes/
            # layout copies, ~10 ms/step in the round-3 profile) never
            # materializes — each BN output flattens (..., 15, h) ->
            # (..., 15h) for one clean matmul, and the partial products
            # sum. Same math as emb.reshape(..., 15*d) @ ck.
            ck3 = ck.reshape(n_slots, d, d)
            w_p = ck3[:, :h, :].reshape(n_slots * h, d)
            w_d = ck3[:, h:, :].reshape(n_slots * h, d)

            def flat(t):
                return t.reshape(t.shape[:-2] + (n_slots * h,))

            x_dr = flat(drums_pitch) @ w_p + flat(drums_dur) @ w_d
            x_nd = flat(nd_pitch) @ w_p + flat(nd_dur) @ w_d
            x = jnp.concatenate([x_dr, x_nd], axis=-3) + cb

        x = jax.nn.relu(x)
        x = nn.Dropout(cfg.dropout, deterministic=deterministic)(x)
        x = x * mask[..., None].astype(x.dtype)

        # Message passing over the lattice.
        x = GCN(dim=d, n_layers=cfg.gnn_n_layers,
                num_relations=constants.N_EDGE_TYPES,
                num_dists=cfg.n_timesteps, batch_norm=cfg.batch_norm,
                dropout=cfg.dropout, message_dropout=cfg.message_dropout,
                message_dropout_mode=cfg.message_dropout_mode,
                use_pallas=cfg.use_pallas_gcl,
                bars_per_block=cfg.gcl_bars_per_block,
                chain=cfg.gcl_chain,
                name="graph_encoder")(
            x, mask, nbr, deterministic=deterministic)

        # Soft-attention pooling into per-bar embeddings
        # (gate = BatchNorm1d(Linear(d->1)), reference model.py:334-340).
        gates = MLP(features=[1], activation=False, dropout=cfg.dropout,
                    name="gate_mlp")(x, deterministic=deterministic)
        gates = MaskedBatchNorm(1, name="gate_bn")(
            gates, mask, use_running_average=deterministic)
        pooled = mops.attention_pool_bars(x, gates, mask)  # (B, nb, d)

        out = pooled.reshape(pooled.shape[0], cfg.n_bars * d)
        return nn.Dense(d, name="bars_encoder")(out)


class StructureEncoder(nn.Module):
    """Reference StructureEncoder (model.py:420-445)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, s_float, *, deterministic: bool):
        cfg = self.cfg
        b = s_float.shape[0]
        x = s_float.reshape(b * cfg.n_bars, cfg.n_tracks, cfg.n_timesteps, 1)
        x = CNNEncoder(output_dim=cfg.d, dense_dim=cfg.d,
                       batch_norm=cfg.batch_norm, dropout=cfg.dropout,
                       name="cnn_encoder")(x, deterministic=deterministic)
        x = x.reshape(b, cfg.n_bars * cfg.d)
        return nn.Dense(cfg.d, name="bars_encoder")(x)


class Encoder(nn.Module):
    """Reference Encoder head (model.py:448-483)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, tokens, mask, nbr, *, deterministic: bool):
        cfg = self.cfg
        z_c = ContentEncoder(cfg, name="c_encoder")(
            tokens, mask, nbr, deterministic=deterministic)
        # the structure input rides the compute dtype (0/1 is exact in
        # bf16): a hard f32 cast here used to promote z_s -> mu -> z -> the
        # ENTIRE decoder to f32 under the bf16 policy (round-3 find)
        z_s = StructureEncoder(cfg, name="s_encoder")(
            mask.astype(z_c.dtype), deterministic=deterministic)

        z_g = jnp.concatenate([z_c, z_s], axis=-1)
        z_g = nn.Dropout(cfg.dropout, deterministic=deterministic)(z_g)
        z_g = nn.Dense(cfg.d, name="linear_merge")(z_g)
        z_g = MaskedBatchNorm(cfg.d, name="bn_linear_merge")(
            z_g, use_running_average=deterministic)
        z_g = jax.nn.relu(z_g)
        z_g = nn.Dropout(cfg.dropout, deterministic=deterministic)(z_g)
        mu = nn.Dense(cfg.d, name="linear_mu")(z_g)
        log_var = nn.Dense(cfg.d, name="linear_log_var")(z_g)
        return mu, log_var


class StructureDecoder(nn.Module):
    """Reference StructureDecoder (model.py:486-505)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, z_s, *, deterministic: bool):
        cfg = self.cfg
        out = nn.Dense(cfg.d * cfg.n_bars, name="bars_decoder")(z_s)
        out = out.reshape(-1, cfg.d)
        out = CNNDecoder(input_dim=cfg.d, dense_dim=cfg.d,
                         n_tracks=cfg.n_tracks, n_timesteps=cfg.n_timesteps,
                         batch_norm=cfg.batch_norm, dropout=cfg.dropout,
                         name="cnn_decoder")(out, deterministic=deterministic)
        return out.reshape(z_s.shape[0], cfg.n_bars, cfg.n_tracks,
                           cfg.n_timesteps)


class DenseParams(nn.Module):
    """Parameter holder with nn.Dense's tree layout (kernel/bias), for
    layers whose application is hand-scheduled (slot-scanned decode)."""

    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_dim, self.out_dim))
        bias = self.param("bias", nn.initializers.zeros, (self.out_dim,))
        return kernel, bias


class ContentDecoder(nn.Module):
    """Reference ContentDecoder (model.py:508-578), dense layout.

    emit='logits' returns (B, nb, T, S, 15, 230) content logits (training /
    parity path). emit='tokens' fuses chord-decode -> unembed -> argmax in a
    scan over the 15 note slots, so the multi-GB logits tensors never
    materialize in HBM (generation fast path; identical argmax results).
    emit='train_stats' is the training-side mirror: the same slot scan
    computes masked-CE sums and accuracy counts against `targets` directly
    (rematerialized backward — jax.checkpoint on the body), so neither the
    logits nor per-slot hiddens are ever stored. Slot-hidden dropout
    (reference model.py:549-550) draws one key per slot inside the scan —
    same iid elementwise semantics as the logits path's nn.Dropout on the
    full (..., 15, d) tensor, so cfg.dropout > 0 trains fused too.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, z_c, mask, nbr, *, deterministic: bool,
                 emit: str = "logits", temperature: float = 0.0,
                 targets: Optional[jax.Array] = None):
        cfg = self.cfg
        d, h = cfg.d, cfg.d // 2
        n_slots = constants.MAX_SIMU_TOKENS - 1

        out = nn.Dense(cfg.d * cfg.n_bars, name="bars_decoder")(z_c)
        z_bars = out.reshape(out.shape[0], cfg.n_bars, d)
        # Broadcast each bar latent to its active cells (the dense analogue of
        # repeat_interleave over per-bar node counts, model.py:542-545).
        x = jnp.broadcast_to(
            z_bars[..., None, None, :],
            z_bars.shape[:2] + (cfg.n_tracks, cfg.n_timesteps, d),
        ) * mask[..., None].astype(out.dtype)

        x = GCN(dim=d, n_layers=cfg.gnn_n_layers,
                num_relations=constants.N_EDGE_TYPES,
                num_dists=cfg.n_timesteps, batch_norm=cfg.batch_norm,
                dropout=cfg.dropout, message_dropout=cfg.message_dropout,
                message_dropout_mode=cfg.message_dropout_mode,
                use_pallas=cfg.use_pallas_gcl,
                bars_per_block=cfg.gcl_bars_per_block,
                chain=cfg.gcl_chain,
                name="graph_decoder")(
            x, mask, nbr, deterministic=deterministic)

        ck, cb = DenseParams(d, n_slots * d, name="chord_decoder")()
        pk_d, pb_d = DenseParams(h, constants.N_PITCH_TOKENS,
                                 name="drums_pitch_emb")()
        pk_n, pb_n = DenseParams(h, constants.N_PITCH_TOKENS,
                                 name="non_drums_pitch_emb")()
        dk, db = DenseParams(h, constants.N_DUR_TOKENS, name="dur_emb")()

        def unembed(slot_h):
            """(..., T, S, d) one slot -> pitch/dur logits."""
            ph, dh = slot_h[..., :h], slot_h[..., h:]
            drums = ph[..., :1, :, :] @ pk_d + pb_d
            nd = ph[..., 1:, :, :] @ pk_n + pb_n
            pitch = jnp.concatenate([drums, nd], axis=-3)
            dur = dh @ dk + db
            return pitch, dur

        if emit == "logits":
            y = x @ ck + cb
            y = y.reshape(y.shape[:-1] + (n_slots, d))
            y = nn.Dropout(cfg.dropout, deterministic=deterministic)(y)
            pitch, dur = unembed(jnp.moveaxis(y, -2, 0))
            return jnp.concatenate(
                [jnp.moveaxis(pitch, 0, -2), jnp.moveaxis(dur, 0, -2)],
                axis=-1)

        if emit == "train_stats":
            assert targets is not None
            # Canonicalize the slot-scan position space to a leading dim of
            # exactly 128 (round-5, VERDICT r4 item 4): XLA's layout
            # assignment puts a 128-long LEADING dim on the vector lanes
            # ({0,3,2,1:T(8,128)} — zero padding) for the slot body's
            # argmax/nll/masked-sum kLoop fusions, but only when dim 0 is
            # 128. The LMD16 microbatch (16 seqs x 16 bars) got row-major
            # {3,2,1,0:T(4,128)} — 32/128 lanes used — making the same ops
            # ~7x slower per position than LMD2's (128 seqs x 2 bars).
            # (batch, bars) is a pure leading-axis split of the same
            # position set, so re-splitting it as (128, P//128) is
            # layout-free and changes only fp32 reduction order.
            P = x.shape[0] * x.shape[1]
            if P % 128 == 0 and x.shape[0] != 128:
                x = x.reshape((128, P // 128) + x.shape[2:])
                targets = targets.reshape((128, P // 128) + targets.shape[2:])
                mask = mask.reshape((128, P // 128) + mask.shape[2:])
            act = mask
            is_drum = jnp.zeros(mask.shape, bool).at[..., 0, :].set(True)
            f32 = jnp.float32

            # Slot-hidden dropout (reference model.py:549-550 applies
            # dropout to the chord-decoded hiddens before unembedding).
            # The logits path drops the full (..., 15, d) tensor at once;
            # here each slot draws its own key inside the scan — identical
            # iid elementwise semantics, the hiddens still never persist.
            drop_p = cfg.dropout if not deterministic else 0.0
            slot_keys = (jax.random.split(self.make_rng("dropout"), n_slots)
                         if drop_p > 0.0 else [None] * n_slots)

            def body(carry, xs):
                w, b, pt, dt_, key = xs
                slot_h = x @ w + b
                if drop_p > 0.0:
                    keep = jax.random.bernoulli(key, 1.0 - drop_p,
                                                slot_h.shape)
                    slot_h = jnp.where(keep, slot_h / (1.0 - drop_p),
                                       0.0).astype(slot_h.dtype)
                pitch, dur = unembed(slot_h)
                lp_p = jax.nn.log_softmax(pitch.astype(f32), axis=-1)
                lp_d = jax.nn.log_softmax(dur.astype(f32), axis=-1)
                # one-hot multiply-reduce instead of take_along_axis: the
                # gather (and its scatter-add backward) profiled at ~30 ms
                # per step across the 15 slots; the masked reduce is pure
                # VPU work and its backward is elementwise
                nll_p = -jnp.sum(
                    lp_p * jax.nn.one_hot(pt, lp_p.shape[-1], dtype=f32),
                    axis=-1)
                nll_d = -jnp.sum(
                    lp_d * jax.nn.one_hot(dt_, lp_d.shape[-1], dtype=f32),
                    axis=-1)
                w_p = act & (pt != constants.PitchToken.PAD)
                w_d = act & (dt_ != constants.DurationToken.PAD)
                cp = (jnp.argmax(lp_p, axis=-1) == pt) & w_p
                cd = (jnp.argmax(lp_d, axis=-1) == dt_) & w_d
                upd = {
                    "pitch_nll": jnp.sum(nll_p * w_p.astype(f32)),
                    "dur_nll": jnp.sum(nll_d * w_d.astype(f32)),
                    "n_p": jnp.sum(w_p.astype(f32)),
                    "n_d": jnp.sum(w_d.astype(f32)),
                    "c_p": jnp.sum(cp.astype(f32)),
                    "c_d": jnp.sum(cd.astype(f32)),
                    "c_both": jnp.sum((cp & cd).astype(f32)),
                    "c_p_dr": jnp.sum((cp & is_drum).astype(f32)),
                    "c_p_nd": jnp.sum((cp & ~is_drum).astype(f32)),
                    "n_p_dr": jnp.sum((w_p & is_drum).astype(f32)),
                    "n_p_nd": jnp.sum((w_p & ~is_drum).astype(f32)),
                }
                return jax.tree_util.tree_map(jnp.add, carry, upd), None

            init = {k: jnp.zeros((), f32) for k in (
                "pitch_nll", "dur_nll", "n_p", "n_d", "c_p", "c_d",
                "c_both", "c_p_dr", "c_p_nd", "n_p_dr", "n_p_nd")}
            # Unrolled over the 15 slots (not lax.scan): each slot reads a
            # STATIC contiguous slice of ck, so no stacked (15, d, d)
            # weight tensor, no moveaxis copies, and — critically — the
            # backward accumulates dck/unembed grads with plain adds in
            # XLA-chosen layouts instead of the scan's dynamic-update-slice
            # + transposed-layout accumulators (profiled at ~7 ms/step).
            # jax.checkpoint per slot keeps the logits rematerialized in
            # the backward exactly as the scanned version did.
            body = jax.checkpoint(body)
            stats = init
            for s in range(n_slots):
                stats, _ = body(stats, (ck[:, s * d:(s + 1) * d],
                                        cb[s * d:(s + 1) * d],
                                        targets[..., s, 0],
                                        targets[..., s, 1],
                                        slot_keys[s]))
            return stats

        # emit == "tokens": only int32 ids reach HBM. Deterministic decode on
        # the Pallas path uses the fused tail kernel (states read once per
        # bar block instead of once per slot).
        if temperature == 0 and cfg.use_pallas_gcl:
            from ..ops.kernels import chord_tail

            return chord_tail.chord_tail_tokens(
                x, ck, cb, pk_d, pb_d, pk_n, pb_n, dk, db, n_slots=n_slots,
                bars_per_block=cfg.tail_bars_per_block)

        w_slots = ck.reshape(d, n_slots, d)
        w_slots = jnp.moveaxis(w_slots, 1, 0)  # (n_slots, d, d)
        b_slots = cb.reshape(n_slots, d)

        if temperature > 0:
            slot_rngs = jax.random.split(self.make_rng("gen"), n_slots)

            def body(_, wb):
                w, b, rng = wb
                slot_h = x @ w + b
                pitch, dur = unembed(slot_h)
                rp, rd = jax.random.split(rng)
                ids = jnp.stack(
                    [jax.random.categorical(rp, pitch / temperature),
                     jax.random.categorical(rd, dur / temperature)],
                    axis=-1).astype(jnp.int32)
                return None, ids

            _, ids = jax.lax.scan(body, None,
                                  (w_slots, b_slots, slot_rngs))
        else:
            def body(_, wb):
                w, b = wb
                slot_h = x @ w + b
                pitch, dur = unembed(slot_h)
                ids = jnp.stack(
                    [jnp.argmax(pitch, axis=-1), jnp.argmax(dur, axis=-1)],
                    axis=-1).astype(jnp.int32)
                return None, ids

            _, ids = jax.lax.scan(body, None, (w_slots, b_slots))
        return jnp.moveaxis(ids, 0, -2)  # (B, nb, T, S, n_slots, 2)


class Decoder(nn.Module):
    """Reference Decoder head (model.py:581-655) with the CPU graph-rebuild
    replaced by in-graph thresholding + lattice ops."""

    cfg: ModelConfig
    sigmoid_thresh: float = 0.5

    @nn.compact
    def __call__(self, z, mask: Optional[jax.Array] = None, *,
                 deterministic: bool, emit: str = "logits",
                 structure_temp: float = 0.0, content_temp: float = 0.0,
                 targets: Optional[jax.Array] = None):
        cfg = self.cfg
        z = nn.Dense(2 * cfg.d, name="lin_decoder")(z)
        z = MaskedBatchNorm(2 * cfg.d, name="batch_norm")(
            z, use_running_average=deterministic)
        z = jax.nn.relu(z)
        z = nn.Dropout(cfg.dropout, deterministic=deterministic)(z)
        z_s, z_c = z[:, :cfg.d], z[:, cfg.d:]

        s_logits = StructureDecoder(cfg, name="s_decoder")(
            z_s, deterministic=deterministic)

        if mask is None:
            raw = jax.lax.stop_gradient(s_logits)
            if structure_temp > 0:
                # Bernoulli sampling with temperature (beyond-reference
                # extension; the reference only hard-thresholds).
                probs = jax.nn.sigmoid(raw / structure_temp)
                mask = jax.random.bernoulli(self.make_rng("gen"), probs)
            else:
                # Hard threshold (reference model.py:609-623), no gradient.
                mask = jax.nn.sigmoid(raw) >= self.sigmoid_thresh
            mask = lattice.ensure_nonempty_bars(mask)

        nbr = lattice.build_neighbors(mask)
        c_out = ContentDecoder(cfg, name="c_decoder")(
            z_c, mask, nbr, deterministic=deterministic, emit=emit,
            temperature=content_temp, targets=targets)
        return s_logits, c_out, mask


class VAE(nn.Module):
    """Reference VAE (model.py:658-678): encode, reparameterize, decode."""

    cfg: ModelConfig

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)

    def __call__(self, tokens, mask, *, deterministic: bool):
        mask = lattice.ensure_nonempty_bars(mask)
        nbr = lattice.build_neighbors(mask)
        mu, log_var = self.encoder(tokens, mask, nbr,
                                   deterministic=deterministic)
        eps = jax.random.normal(self.make_rng("sample"), mu.shape, mu.dtype)
        z = mu + jnp.exp(0.5 * log_var) * eps
        s_logits, c_logits, _ = self.decoder(z, mask,
                                             deterministic=deterministic)
        return (s_logits, c_logits), mu, log_var

    def train_stats(self, tokens, mask, *, deterministic: bool = False):
        """Training forward returning slot-scanned loss/metric statistics
        instead of content logits — the (B, nb, T, S, 15, 230) tensor never
        materializes (the training-side mirror of decode_tokens). Same
        reparameterized pass as __call__; losses_from_stats /
        accuracies_from_stats (train/) map the stats to the reference's
        seven losses and nine metrics."""
        mask = lattice.ensure_nonempty_bars(mask)
        nbr = lattice.build_neighbors(mask)
        mu, log_var = self.encoder(tokens, mask, nbr,
                                   deterministic=deterministic)
        eps = jax.random.normal(self.make_rng("sample"), mu.shape, mu.dtype)
        z = mu + jnp.exp(0.5 * log_var) * eps
        s_logits, stats, _ = self.decoder(
            z, mask, deterministic=deterministic, emit="train_stats",
            targets=tokens[..., 1:, :])
        return (s_logits, stats), mu, log_var

    def encode(self, tokens, mask, *, deterministic: bool = True):
        mask = lattice.ensure_nonempty_bars(mask)
        nbr = lattice.build_neighbors(mask)
        return self.encoder(tokens, mask, nbr, deterministic=deterministic)

    def decode(self, z, mask: Optional[jax.Array] = None, *,
               deterministic: bool = True):
        return self.decoder(z, mask, deterministic=deterministic)

    def decode_tokens(self, z, mask: Optional[jax.Array] = None, *,
                      deterministic: bool = True,
                      structure_temp: float = 0.0,
                      content_temp: float = 0.0):
        """Generation fast path: (s_logits, token_ids, mask) with the
        unembed + argmax/sampling fused per slot (no logits
        materialization). Temperatures of 0 reproduce the reference's
        deterministic threshold/argmax decoding; >0 samples (needs a 'gen'
        rng)."""
        return self.decoder(z, mask, deterministic=deterministic,
                            emit="tokens", structure_temp=structure_temp,
                            content_temp=content_temp)
