"""Graph-MIL: GNN message passing over patch graphs + attention pooling.

Re-creates ``GraphMIL`` and its layer zoo (``utils_g_mil.py:289-492``) with
dense-adjacency formulations — at 196 nodes each conv is a [N, N]×[N, D]
matmul on the MXU, the TPU-idiomatic replacement for torch_geometric's
edge-index scatter kernels (SURVEY.md §2.2).

Layer semantics follow the published pyg definitions:
  gcn          D̂^{-1/2}(A+I)D̂^{-1/2} X W + b
  gin          MLP((1+ε)·x + Σ_neighbors x), ε trainable (train_eps=True)
  graphsage    W₁x + W₂·mean_neighbors(x), L2-normalized (normalize=True)
  gat          LeakyReLU(a·[Wh_i ‖ Wh_j]) attention, self loops, heads concat
  transformer  scaled dot-product attention per edge with the β-gated skip
               (beta=True) of pyg's TransformerConv
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _with_self_loops(adj: jnp.ndarray) -> jnp.ndarray:
    n = adj.shape[0]
    return jnp.maximum(adj, jnp.eye(n, dtype=adj.dtype))


def _dropout(module: nn.Module, h: jnp.ndarray, rate, train: bool):
    """``nn.Dropout`` semantics with a possibly-TRACED rate.

    The packed HPO path (``hpo/population.py``) vmaps a cohort of trials with
    different dropout rates through ONE program — ``jax.random.bernoulli``
    accepts a traced probability, ``nn.Dropout``'s static attribute does not.
    Same math as flax: keep with prob (1-rate), scale kept units by 1/keep.
    """
    if not train:
        return h
    keep = 1.0 - rate
    mask = jax.random.bernoulli(module.make_rng("dropout"), keep, h.shape)
    return jnp.where(mask, h / jnp.maximum(keep, 1e-12), 0.0)


class GCNLayer(nn.Module):
    out_dim: int

    @nn.compact
    def __call__(self, x, adj):
        a = _with_self_loops(adj)
        deg = a.sum(axis=1)
        d = 1.0 / jnp.sqrt(jnp.maximum(deg, 1e-12))
        a_norm = a * d[:, None] * d[None, :]
        return a_norm @ nn.Dense(self.out_dim, name="lin")(x)


class GINLayer(nn.Module):
    """GINConv wrapping the reference's inner MLP
    (Linear→LayerNorm→ReLU→Linear, ``utils_g_mil.py:293-298``)."""
    out_dim: int

    @nn.compact
    def __call__(self, x, adj):
        eps = self.param("eps", nn.initializers.zeros, ())
        agg = adj @ x + (1.0 + eps) * x
        h = nn.Dense(self.out_dim, name="mlp_fc1")(agg)
        h = nn.LayerNorm(name="mlp_ln")(h)
        h = nn.relu(h)
        return nn.Dense(self.out_dim, name="mlp_fc2")(h)


class GraphSAGELayer(nn.Module):
    out_dim: int
    normalize: bool = True

    @nn.compact
    def __call__(self, x, adj):
        deg = jnp.maximum(adj.sum(axis=1, keepdims=True), 1.0)
        mean_nbr = (adj @ x) / deg
        out = nn.Dense(self.out_dim, name="lin_self")(x) + \
            nn.Dense(self.out_dim, use_bias=False, name="lin_nbr")(mean_nbr)
        if self.normalize:
            out = out / jnp.maximum(jnp.linalg.norm(out, axis=1, keepdims=True), 1e-12)
        return out


class GATLayer(nn.Module):
    out_dim: int
    heads: int = 4
    concat: bool = True
    dropout: float = 0.0
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x, adj, train: bool = False, dropout_rate=None):
        rate = self.dropout if dropout_rate is None else dropout_rate
        n = x.shape[0]
        a = _with_self_loops(adj)
        h = nn.Dense(self.heads * self.out_dim, use_bias=False, name="lin")(x)
        h = h.reshape(n, self.heads, self.out_dim)
        att_src = self.param("att_src", nn.initializers.glorot_uniform(),
                             (self.heads, self.out_dim))
        att_dst = self.param("att_dst", nn.initializers.glorot_uniform(),
                             (self.heads, self.out_dim))
        alpha_src = (h * att_src[None]).sum(-1)  # [N, H]
        alpha_dst = (h * att_dst[None]).sum(-1)
        # e[i, j, h] for edge j->i aggregation at node i
        e = alpha_dst[:, None, :] + alpha_src[None, :, :]
        e = nn.leaky_relu(e, self.negative_slope)
        e = jnp.where(a[:, :, None] > 0, e, NEG_INF)
        alpha = jax.nn.softmax(e, axis=1)
        alpha = _dropout(self, alpha, rate, train)
        out = jnp.einsum("ijh,jhd->ihd", alpha, h)
        bias_shape = (self.heads * self.out_dim,) if self.concat else (self.out_dim,)
        bias = self.param("bias", nn.initializers.zeros, bias_shape)
        if self.concat:
            return out.reshape(n, self.heads * self.out_dim) + bias
        return out.mean(axis=1) + bias


class TransformerConvLayer(nn.Module):
    out_dim: int
    heads: int = 4
    concat: bool = True
    dropout: float = 0.0
    beta: bool = True

    @nn.compact
    def __call__(self, x, adj, train: bool = False, dropout_rate=None):
        rate = self.dropout if dropout_rate is None else dropout_rate
        n = x.shape[0]
        a = _with_self_loops(adj)  # pyg TransformerConv default root_weight via skip
        d = self.out_dim
        q = nn.Dense(self.heads * d, name="lin_q")(x).reshape(n, self.heads, d)
        k = nn.Dense(self.heads * d, name="lin_k")(x).reshape(n, self.heads, d)
        v = nn.Dense(self.heads * d, name="lin_v")(x).reshape(n, self.heads, d)
        scores = jnp.einsum("ihd,jhd->ijh", q, k) / jnp.sqrt(float(d))
        scores = jnp.where(a[:, :, None] > 0, scores, NEG_INF)
        alpha = jax.nn.softmax(scores, axis=1)
        alpha = _dropout(self, alpha, rate, train)
        msg = jnp.einsum("ijh,jhd->ihd", alpha, v)
        skip = nn.Dense(self.heads * d, name="lin_skip")(x).reshape(n, self.heads, d)
        if self.beta:
            gate_in = jnp.concatenate([skip, msg, skip - msg], axis=-1)
            beta = jax.nn.sigmoid(
                nn.Dense(1, use_bias=False, name="lin_beta")(gate_in))
            out = beta * skip + (1.0 - beta) * msg
        else:
            out = skip + msg
        if self.concat:
            return out.reshape(n, self.heads * d)
        return out.mean(axis=1)


class GraphMIL(nn.Module):
    """Reference semantics (``utils_g_mil.py:329-492``): optional input
    projection for residuals, N GNN layers with LayerNorm+ReLU+dropout and
    shape-matched residuals, multi-head Tanh-gate attention pooling (mean of
    heads), light or deep classifier, softmax probabilities out."""
    input_dim: int = 768
    gnn_type: str = "gat"
    gnn_hidden: int = 256
    gnn_layers: int = 2
    gnn_dropout: float = 0.1
    gnn_heads: int = 4
    gnn_concat: bool = True
    att_dim: int = 128
    att_heads: int = 4
    pool_dropout: float = 0.2
    classifier_dim: int = 128
    classifier_light: bool = False
    num_classes: int = 7
    use_residual: bool = True
    use_layer_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, adj: jnp.ndarray,
                 valid: Optional[jnp.ndarray] = None,
                 train: bool = False,
                 gnn_dropout_rate=None,
                 pool_dropout_rate=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """``gnn_dropout_rate`` / ``pool_dropout_rate`` optionally override
        the static attributes with TRACED scalars so a vmapped trial cohort
        with per-trial dropout shares one program (``hpo/population.py``)."""
        g_rate = self.gnn_dropout if gnn_dropout_rate is None else gnn_dropout_rate
        p_rate = self.pool_dropout if pool_dropout_rate is None else pool_dropout_rate
        gnn_type = self.gnn_type.lower()
        h = x
        if self.use_residual and self.input_dim != self.gnn_hidden:
            h = nn.Dense(self.gnn_hidden, name="input_proj")(h)

        for i in range(self.gnn_layers):
            h_prev = h
            if gnn_type == "gin":
                h = GINLayer(self.gnn_hidden, name=f"gnn_{i}")(h, adj)
            elif gnn_type == "graphsage":
                h = GraphSAGELayer(self.gnn_hidden, name=f"gnn_{i}")(h, adj)
            elif gnn_type == "transformer":
                h = TransformerConvLayer(self.gnn_hidden, self.gnn_heads,
                                         self.gnn_concat, self.gnn_dropout,
                                         name=f"gnn_{i}")(h, adj, train=train,
                                                          dropout_rate=g_rate)
            elif gnn_type == "gat":
                h = GATLayer(self.gnn_hidden, self.gnn_heads, self.gnn_concat,
                             self.gnn_dropout, name=f"gnn_{i}")(
                                 h, adj, train=train, dropout_rate=g_rate)
            elif gnn_type == "gcn":
                h = GCNLayer(self.gnn_hidden, name=f"gnn_{i}")(h, adj)
            else:
                raise ValueError(f"Unsupported gnn_type: {gnn_type}")
            if self.use_layer_norm:
                h = nn.LayerNorm(name=f"ln_{i}")(h)
            h = nn.relu(h)
            h = _dropout(self, h, g_rate, train)
            if self.use_residual and h_prev.shape == h.shape:
                h = h + h_prev

        # multi-head attention pooling
        attentions = []
        pooled = []
        for j in range(self.att_heads):
            scores = nn.Dense(1, name=f"pool_att{j}_fc2")(
                jnp.tanh(nn.Dense(self.att_dim, name=f"pool_att{j}_fc1")(h)))
            if valid is not None:
                scores = jnp.where(valid[:, None], scores, NEG_INF)
            a = jax.nn.softmax(scores, axis=0)
            attentions.append(a)
            pooled.append(jnp.sum(a * h, axis=0))
        z = jnp.stack(pooled, axis=0).mean(axis=0)
        attention = jnp.concatenate(attentions, axis=1)  # [N, att_heads]

        if self.classifier_light:
            c = nn.Dense(self.classifier_dim, name="cls_fc1")(z)
            c = nn.relu(c)
            c = _dropout(self, c, p_rate, train)
            logits = nn.Dense(self.num_classes, name="cls_fc2")(c)
        else:
            c = nn.Dense(self.classifier_dim, name="cls_fc1")(z)
            c = nn.LayerNorm(name="cls_ln1")(c)
            c = nn.relu(c)
            c = _dropout(self, c, p_rate, train)
            c = nn.Dense(self.classifier_dim // 2, name="cls_fc2")(c)
            c = nn.LayerNorm(name="cls_ln2")(c)
            c = nn.relu(c)
            c = _dropout(self, c, p_rate / 2, train)
            logits = nn.Dense(self.num_classes, name="cls_fc3")(c)
        probs = jax.nn.softmax(logits, axis=0)
        return probs, attention
