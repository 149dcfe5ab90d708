"""Shared neural building blocks (flax.linen).

ONE implementation of each block the reference duplicates across ~10
files (HGCNConv, SpAdjDropEdge, MLP, Attention — survey 7.4): graph
convs are pure functions over `AdjPair`s; parameterised blocks are
linen modules.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..data.device import AdjPair
from ..ops.sparse import spmm, spmm_pair, two_hop as _two_hop


def leaky(x: jnp.ndarray, slope: float) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, negative_slope=slope)


def hgcn_conv(adj: AdjPair, x: jnp.ndarray, slope: float = 0.3, act: bool = True) -> jnp.ndarray:
    """act(A @ (A^T @ X)) — the ubiquitous two-hop hypergraph conv
    (reference HGCNConv, KHGRec.py:455-464 and ~10 duplicates)."""
    out = _two_hop(adj.fwd, adj.bwd, x)
    return leaky(out, slope) if act else out


def gcn_prop(adj: AdjPair, x: jnp.ndarray) -> jnp.ndarray:
    """One-hop propagation A @ X (LightGCN.py:133, HCCF GCNLayer)."""
    return spmm_pair(adj.fwd, adj.bwd, x)


class MLP(nn.Module):
    """n-layer MLP with optional LayerNorm/BatchNorm-free normalisation.

    Mirrors reference model/layers/MLP.py:29-117 (Normalization in
    {'None','ln'}, optional InputNorm). BatchNorm is intentionally
    replaced by LayerNorm (batch-independent, TPU-friendly); the HD
    configs all use 'ln' or 'None' (HGNN_HD3.py:396-411).
    """

    hidden: int
    out: int
    n_layers: int = 1
    dropout: float = 0.0
    normalization: str = "None"
    input_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.n_layers == 0:
            return x
        if self.input_norm:
            x = nn.LayerNorm()(x)
        for k in range(self.n_layers - 1):
            x = nn.Dense(self.hidden)(x)
            if self.normalization == "ln":
                x = nn.LayerNorm()(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.out)(x)
        return x


class AttentionFusion(nn.Module):
    """2-way softmax gating over stacked views (reference Attention,
    KHGRec.py:466-480): z [N, V, D] -> (sum(beta * z), beta)."""

    hidden: int

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        w = nn.Dense(self.hidden)(z)
        w = jnp.tanh(w)
        w = nn.Dense(self.hidden, use_bias=False)(w)
        beta = jax.nn.softmax(w, axis=1)
        return jnp.sum(beta * z, axis=1), beta


def mean_pool_feature(x: jnp.ndarray, out_dim: int) -> jnp.ndarray:
    """AdaptiveAvgPool1d(out_dim) over the feature axis — used by the
    SpMM-form EquivSetConv to shrink [X, Xe] concat back to d
    (model/layers/EquivSetConv.py:72,100). For in_dim = 2*out_dim this
    averages adjacent pairs."""
    n, d = x.shape
    assert d % out_dim == 0, (d, out_dim)
    return x.reshape(n, out_dim, d // out_dim).mean(axis=-1)


class EquivSetConvSpMM(nn.Module):
    """ED-HNN diffusion step, SpMM form — the variant the HD family
    actually trains with (model/layers/EquivSetConv.py:86-107):

      Xve = W1(X)
      Xe  = LN(HGCN(adj, Xve)) + Xve            # residual two-hop
      Xev = mean_pool(W2([X, Xe]))
      Xv  = LN(HGCN(adj, Xev)) + Xev
      X   = W((1-alpha) Xv + alpha X0)
    """

    dim: int
    mlp1_layers: int = 0
    mlp2_layers: int = 0
    mlp3_layers: int = 1
    alpha: float = 0.0
    dropout: float = 0.5
    normalization: str = "ln"
    input_norm: bool = True
    leaky_slope: float = 0.2
    inner: str = "hgcn"  # 'hgcn' | 'wavelet' (WaveletHD routes the inner
    # conv through the HWNN approximation, WaveletHD.py:346-417)

    @nn.compact
    def __call__(self, x: jnp.ndarray, adj: AdjPair, x0: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = self.dim
        n = x.shape[0]

        def inner_conv(v):
            if self.inner == "wavelet":
                return HWNNLayer(n, d, side="adj")(v, adj, train)
            return hgcn_conv(adj, v, self.leaky_slope, act=True)

        if self.mlp1_layers > 0:
            xve = MLP(d, d, self.mlp1_layers, self.dropout, self.normalization, self.input_norm)(x, train)
        else:
            xve = x
        xe = nn.LayerNorm()(inner_conv(xve)) + xve
        cat = jnp.concatenate([x, xe], axis=-1)
        if self.mlp2_layers > 0:
            xev = MLP(d, d, self.mlp2_layers, self.dropout, self.normalization, self.input_norm)(cat, train)
        else:
            xev = cat
        xev = mean_pool_feature(xev, d)
        xv = nn.LayerNorm()(inner_conv(xev)) + xev
        x = (1.0 - self.alpha) * xv + self.alpha * x0
        if self.mlp3_layers > 0:
            x = MLP(d, d, self.mlp3_layers, self.dropout, self.normalization, self.input_norm)(x, train)
        return x


class EquivSetConvScatter(nn.Module):
    """Canonical ED-HNN diffusion operator, scatter form
    (model/layers/layers2/EquivSetConv2.py:85-100):

      Xve = W1(X)[vertex]                       # [nnz, d]
      Xe  = scatter(Xve, edges, reduce=aggr)    # V -> E
      Xev = W2([X[vertex], Xe[edges]])          # [nnz, d]
      Xv  = scatter(Xev, vertex, dim_size=N)    # E -> V
      X   = W((1-alpha) Xv + alpha X0)

    vertex/edges come from the incidence COO of a star-expanded
    hypergraph; here they are the (row, col) arrays of an AdjPair whose
    fwd matrix is the V x E incidence.
    """

    dim: int
    n_edges: int
    aggr: str = "mean"
    mlp1_layers: int = 1
    mlp2_layers: int = 1
    mlp3_layers: int = 1
    alpha: float = 0.5
    dropout: float = 0.0
    normalization: str = "None"
    input_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, inc: AdjPair, x0: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from ..ops.sparse import scatter_mean, scatter_sum

        d = self.dim
        n = x.shape[0]
        vertex = jnp.clip(inc.fwd.rows, 0, n - 1)  # pad rows clip; weights 0 via mask
        edges = inc.fwd.cols
        live = (inc.fwd.rows < n).astype(x.dtype)[:, None]
        reduce = scatter_mean if self.aggr == "mean" else scatter_sum

        if self.mlp1_layers > 0:
            xw = MLP(d, d, self.mlp1_layers, self.dropout, self.normalization, self.input_norm)(x, train)
        else:
            xw = x
        xve = xw[vertex] * live
        xe = reduce(xve, edges, self.n_edges, sorted_ids=False)
        xev_in = jnp.concatenate([x[vertex], xe[edges]], axis=-1) * live
        if self.mlp2_layers > 0:
            xev = MLP(d, d, self.mlp2_layers, self.dropout, self.normalization, self.input_norm)(xev_in, train)
        else:
            xev = xev_in[..., d:]
        xv = reduce(xev * live, inc.fwd.rows, n, sorted_ids=True)
        x = (1.0 - self.alpha) * xv + self.alpha * x0
        if self.mlp3_layers > 0:
            x = MLP(d, d, self.mlp3_layers, self.dropout, self.normalization, self.input_norm)(x, train)
        return x


class EquivSetGNN(nn.Module):
    """ED-HNN wrapper (model/layers/EquivSetGNN.py:83-144 /
    HGNN_HD3.py:555-610): input dropout -> Linear lift -> relu ->
    nlayer x (dropout -> conv) -> activation -> dropout.

    ONE canonical signature (the reference has four variants with
    mismatched constructors — survey 7.4)."""

    dim: int
    n_conv_layers: int = 1
    input_dropout: float = 0.6
    dropout: float = 0.5
    alpha: float = 0.0
    mlp1_layers: int = 0
    mlp2_layers: int = 0
    mlp3_layers: int = 1
    leaky_slope: float = 0.2
    inner: str = "hgcn"

    @nn.compact
    def __call__(self, x: jnp.ndarray, adj: AdjPair, train: bool = False) -> jnp.ndarray:
        x = nn.Dropout(self.input_dropout, deterministic=not train)(x)
        x = nn.relu(nn.Dense(self.dim)(x))
        x0 = x
        conv = EquivSetConvSpMM(
            self.dim,
            self.mlp1_layers,
            self.mlp2_layers,
            self.mlp3_layers,
            self.alpha,
            self.dropout,
            leaky_slope=self.leaky_slope,
            inner=self.inner,
        )
        for _ in range(self.n_conv_layers):
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
            x = conv(x, adj, x0, train)
            x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class EquivSetGNNScatter(nn.Module):
    """ED-HNN wrapper around the scatter-form conv, for RECTANGULAR
    incidences (vertices x hyperedges) — the DHCF_diffusion channels
    (DHCF_diffusion.py:171-185, intended call: x = embeddings,
    incidence = raw U x I interaction matrix; the reference's actual
    call swaps the arguments and crashes at HEAD — survey 7.4)."""

    dim: int
    n_edges: int
    n_conv_layers: int = 1
    input_dropout: float = 0.6
    dropout: float = 0.5
    alpha: float = 0.0
    aggr: str = "mean"

    @nn.compact
    def __call__(self, x: jnp.ndarray, inc: AdjPair, train: bool = False) -> jnp.ndarray:
        x = nn.Dropout(self.input_dropout, deterministic=not train)(x)
        x = nn.relu(nn.Dense(self.dim)(x))
        x0 = x
        conv = EquivSetConvScatter(
            self.dim, n_edges=self.n_edges, aggr=self.aggr,
            mlp1_layers=0, mlp2_layers=0, mlp3_layers=1,
            alpha=self.alpha, dropout=self.dropout,
            normalization="ln", input_norm=True,
        )
        for _ in range(self.n_conv_layers):
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
            x = nn.relu(conv(x, inc, x0, train))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class DenseEquivSetGNN(nn.Module):
    """ED-HNN over a DENSE LEARNABLE incidence H [V, E] (HCCF_diffusion's
    hyperedge branch, HCCF_diffusion.py:193-211 + 291-317).

    The reference extracts V/E index lists from `nonzero(H > 0)` each
    forward — a dynamic-shape op. TPU-first equivalent: the mask
    M = (H > 0) is kept dense and the mean-scatters become two masked
    dense matmuls (E is small, e.g. 128 — MXU-friendly):
        Xe = (M^T @ W1(X)) / colsum(M)
        Xv = (M  @ Xe)     / rowsum(M)
    which is exactly scatter-mean over the positive entries.
    """

    dim: int
    input_dropout: float = 0.6
    dropout: float = 0.5
    alpha: float = 0.0
    n_conv_layers: int = 1
    mlp3_layers: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, incidence: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        mask = (incidence > 0).astype(x.dtype)  # [V, E]
        col = jnp.maximum(jnp.sum(mask, axis=0), 1.0)  # [E]
        row = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)  # [V, 1]

        x = nn.Dropout(self.input_dropout, deterministic=not train)(x)
        x = nn.relu(nn.Dense(self.dim)(x))
        x0 = x
        mlp3 = MLP(self.dim, self.dim, self.mlp3_layers, self.dropout, "ln", True)
        for _ in range(self.n_conv_layers):
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
            xe = (mask.T @ x) / col[:, None]
            xv = (mask @ xe) / row
            x = (1.0 - self.alpha) * xv + self.alpha * x0
            x = nn.relu(mlp3(x, train))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class HWNNLayer(nn.Module):
    """Hypergraph wavelet conv with Chebyshev-style K1/K2 polynomial
    approximation (model/layers/wavelet.py:109-154):

      out = poly(Theta) @ diag(w) @ poly_t(Theta^T) @ X @ W
      poly   = par[0] I + sum_{k=1..K1-1} par[k] Theta^k
      poly_t = par[K1] I + sum_{k=1..K2-1} par[K1+k] (Theta^T)^k

    TPU-first: Theta = D_v^-1/2 H D_e^-1 H^T D_v^-1/2 is NEVER
    materialised (the reference does dense todense() products,
    wavelet.py:96-97,130-147 — survey 7.3); it is applied as
    B @ (B^T @ X) with B = D_v^-1/2 H D_e^-1/2, so every polynomial
    term is two rectangular SpMMs. `side` selects the vertex side of
    the incidence: 'u' -> Theta_uu = B B^T, 'i' -> Theta_ii = B^T B,
    'adj' -> Theta = S S^T over the full node set (the reference's
    `msg == 'simple'` else-branch, wavelet.py:125-127, with S the
    normalised bipartite adjacency). Theta is symmetric in all three
    cases, so poly_t uses the same operator.
    """

    n_nodes: int
    dim: int
    k1: int = 3
    k2: int = 3
    side: str = "u"

    @nn.compact
    def __call__(self, x: jnp.ndarray, b_hyper: AdjPair, train: bool = False) -> jnp.ndarray:
        par = self.param("par", nn.initializers.uniform(scale=0.99), (self.k1 + self.k2,))
        diag_w = self.param(
            "diagonal_weight_filter",
            lambda key, shape: jax.random.uniform(key, shape, minval=0.99, maxval=1.01),
            (self.n_nodes,),
        )
        weight = self.param(
            "weight_matrix", nn.initializers.xavier_uniform(), (x.shape[-1], self.dim)
        )

        def theta(v: jnp.ndarray) -> jnp.ndarray:
            if self.side in ("u", "adj"):
                return _two_hop(b_hyper.fwd, b_hyper.bwd, v)
            return _two_hop(b_hyper.bwd, b_hyper.fwd, v)

        # y = poly_t(Theta) X  (Theta symmetric -> Theta^T == Theta)
        y = par[self.k1] * x
        term = x
        for k in range(1, self.k2):
            term = theta(term)
            y = y + par[self.k1 + k] * term
        y = diag_w[:, None] * y
        out = par[0] * y
        term = y
        for k in range(1, self.k1):
            term = theta(term)
            out = out + par[k] * term
        return out @ weight


class SelfAttentionBlock(nn.Module):
    """Single-head transformer encoder layer over the node set —
    reference UGformer-style self-attention (KHGRec.py:393-408,
    TransformerEncoderLayer d_model=hyper, nhead=1, ff=32). O(N^2):
    disabled by default exactly like the reference (use_self_att=False,
    KHGRec.py:387)."""

    dim: int
    ff_dim: int = 32
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        attn = nn.MultiHeadDotProductAttention(
            num_heads=1, qkv_features=self.dim, deterministic=not train
        )(x[None])[0]
        x = nn.LayerNorm()(x + nn.Dropout(self.dropout, deterministic=not train)(attn))
        ff = nn.Dense(self.ff_dim)(x)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout, deterministic=not train)(ff)
        ff = nn.Dense(self.dim)(ff)
        x = nn.LayerNorm()(x + nn.Dropout(self.dropout, deterministic=not train)(ff))
        return x
