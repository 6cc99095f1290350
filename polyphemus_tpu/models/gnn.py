"""Dense relational GNN over the bar lattice (flax.linen).

Replaces the reference's GCL/GCN sparse stack (/root/reference/model.py:41-208)
with the masked dense formulation of ops/lattice.py. One `edge_nn` Dense is
shared by every layer of a stack, exactly like the reference
(model.py:175-184), and materialized once per forward as a (S, d) gate table.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import lattice
from ..ops.kernels import gcl_pallas
from .layers import MaskedBatchNorm


class GCLParams(nn.Module):
    """Parameters of one relational graph conv layer (RGCNConv layout:
    weight (n_relations, d_in, d_out), root, bias)."""

    in_dim: int
    out_dim: int
    num_relations: int = 6

    @nn.compact
    def __call__(self):
        rel_weight = self.param(
            "rel_weight", nn.initializers.glorot_uniform(),
            (self.num_relations, self.in_dim, self.out_dim),
        )
        root = self.param(
            "root", nn.initializers.glorot_uniform(),
            (self.in_dim, self.out_dim),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_dim,))
        return rel_weight, root, bias


class GCN(nn.Module):
    """Residual stack of dense relational GCL layers (reference GCN,
    model.py:167-208). x: (..., T, S, d) masked node states.

    use_pallas selects the fused VMEM kernel (inference path; no VJP).
    """

    dim: int
    n_layers: int
    num_relations: int = 6
    num_dists: int = 32
    batch_norm: bool = False
    dropout: float = 0.1
    # The reference's hard-coded p=0.1 per-edge message dropout
    # (model.py:44,133). When > 0, training uses the XLA GCL (the fused
    # Pallas kernel has no dropout injection point). Mode "edge" = exact
    # per-edge masks, "aggregate" = round-2 proxy on the aggregates. See
    # ModelConfig.message_dropout / message_dropout_mode.
    message_dropout: float = 0.0
    message_dropout_mode: str = "edge"
    use_pallas: bool = False
    # VMEM tile size of the fused kernel (bars per invocation).
    bars_per_block: int = 4
    # Eval-path layer chaining: process this many GCL layers per Pallas
    # invocation (node states never return to HBM between chained layers;
    # the per-bar selection statics build once per chain). 1 disables.
    # Needs scoped VMEM beyond 16 MB for most (chain, dtype) combos — the
    # enclosing jit must raise xla_tpu_scoped_vmem_limit_kib to
    # gcl_pallas.chain_vmem_bytes (generate.make_generator does).
    chain: int = 1

    @nn.compact
    def __call__(self, x, mask, nbr, *, deterministic: bool):
        edge_nn = nn.Dense(self.dim, name="edge_nn")
        # gate_table[d] = edge_nn(one_hot(d)) = kernel[d] + bias
        eye = jnp.eye(self.num_dists, dtype=x.dtype)
        gate_table = edge_nn(eye)  # (S, d)

        n_tracks = mask.shape[-2]
        aux = gcl_pallas.build_kernel_aux(mask) if self.use_pallas else None

        # Fully-fused inference path: GCL + folded-BN + relu + residual in
        # one kernel per layer (eval mode only — training BN needs batch
        # statistics).
        if self.use_pallas and deterministic:
            # sweepable eval tile (see scripts/probes/vmem_probe.py);
            # fp32 still clamps to 4 inside gcl_apply_pallas unless the
            # raised-VMEM budget is active
            eval_bb = (int(os.environ.get("POLY_GCL_EVAL_BB", 0))
                       or self.bars_per_block)
            chain = (int(os.environ.get("POLY_GCL_CHAIN", 0))
                     or self.chain)
            per_layer = []  # (wbig, bias, ea, eb), param order preserved
            for i in range(self.n_layers):
                rel_weight, root, bias = GCLParams(
                    self.dim, self.dim, self.num_relations,
                    name=f"layers_{i}")()
                if self.batch_norm:
                    affine = MaskedBatchNorm(
                        self.dim, name=f"norm_layers_{i}").folded_affine()
                else:
                    affine = (jnp.ones((self.dim,), x.dtype),
                              jnp.zeros((self.dim,), x.dtype))
                wbig = gcl_pallas.pack_weights(rel_weight, root, n_tracks,
                                               dtype=x.dtype)
                per_layer.append((wbig, bias.astype(x.dtype),
                                  affine[0].astype(x.dtype),
                                  affine[1].astype(x.dtype)))
            if chain > 1:
                d = self.dim
                for lo in range(0, self.n_layers, chain):
                    grp = per_layer[lo:lo + chain]
                    x = gcl_pallas.gcl_apply_pallas_chain(
                        x, aux, gate_table,
                        jnp.stack([g[0] for g in grp]),
                        jnp.stack([g[1].reshape(1, d) for g in grp]),
                        jnp.stack([g[2].reshape(1, d) for g in grp]),
                        jnp.stack([g[3].reshape(1, d) for g in grp]),
                        bars_per_block=eval_bb)
                return x
            for wbig, bias, ea, eb in per_layer:
                x = gcl_pallas.gcl_apply_pallas(
                    x, aux, gate_table, wbig, bias,
                    epilogue_affine=(ea, eb),
                    bars_per_block=eval_bb)
            return x

        m_f = mask[..., None].astype(x.dtype)
        msg_drop = self.message_dropout if not deterministic else 0.0
        for i in range(self.n_layers):
            residual = x
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
            rel_weight, root, bias = GCLParams(
                self.dim, self.dim, self.num_relations,
                name=f"layers_{i}")()
            if self.use_pallas and msg_drop == 0.0:
                x = gcl_pallas.gcl_fused(x, gate_table, rel_weight, root,
                                         bias, aux, mask)
            else:
                rng = self.make_rng("dropout") if msg_drop > 0.0 else None
                x = lattice.gcl_apply(
                    x, mask, nbr, gate_table, rel_weight, root, bias,
                    message_dropout=msg_drop, dropout_rng=rng,
                    message_dropout_mode=self.message_dropout_mode)
            if self.batch_norm:
                x = MaskedBatchNorm(self.dim, name=f"norm_layers_{i}")(
                    x, mask, use_running_average=deterministic)
                x = x * m_f
            x = jax.nn.relu(x)
            x = residual + x
        return x
