"""ProteinMPNN (inverse folding) in JAX/flax.

Re-implementation of the message-passing architecture of Dauparas et al.
2022 with the same tensor contracts as the vendored reference CLI
(`ProteinMPNN/protein_mpnn_utils.py`: ProteinFeatures :899, EncLayer :602,
DecLayer :650, ProteinMPNN :998), so released `.pt` weights convert
directly (see `interop/mpnn_convert.py`). Used by the self-consistency
pipeline (sample -> design sequences -> fold -> scRMSD), replacing the
reference's subprocess invocation (`inference_se3_diffusion.py:315-356`).

TPU-first design notes:

* The k-NN graph uses static k; all gathers are `jnp.take_along_axis`
  with static shapes.
* Autoregressive sampling runs as a `lax.scan` over decode steps where
  each step recomputes the full-width decoder stack and reads the active
  position's logits. That is O(N) more FLOPs than the reference's
  per-position cache walk — and still <1% of a diffusion trajectory's
  cost — in exchange for one compiled program with perfectly regular
  shapes (the reference's incremental cache update is a scatter-heavy,
  latency-bound pattern on any accelerator).
* Teacher-forced `forward` and `sample` share the decoder; causality
  comes from the decoding-order mask exactly as in the reference, so
  sampled sequences score identically under `forward`.
"""
from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

# ProteinMPNN's alphabet (index -> letter), 21 = 20 aa + X.
MPNN_ALPHABET = "ACDEFGHIKLMNPQRSTVWYX"
LN_EPS = 1e-5  # torch LayerNorm default, for weight parity


class MPNNConfig(NamedTuple):
    num_letters: int = 21
    node_features: int = 128
    edge_features: int = 128
    hidden_dim: int = 128
    num_encoder_layers: int = 3
    num_decoder_layers: int = 3
    k_neighbors: int = 48
    num_rbf: int = 16
    num_positional_embeddings: int = 16
    max_relative_feature: int = 32
    augment_eps: float = 0.0
    ca_only: bool = False


def _rbf(d: Array, num_rbf: int) -> Array:
    d_min, d_max = 2.0, 22.0
    mu = jnp.linspace(d_min, d_max, num_rbf)
    sigma = (d_max - d_min) / num_rbf
    return jnp.exp(-(((d[..., None] - mu) / sigma) ** 2))


def gather_nodes(nodes: Array, e_idx: Array) -> Array:
    """[B, N, C] gathered at [B, N, K] -> [B, N, K, C]."""
    b, n, k = e_idx.shape
    c = nodes.shape[-1]
    idx = e_idx.reshape(b, n * k)[..., None]
    out = jnp.take_along_axis(nodes, idx.repeat(c, axis=-1), axis=1)
    return out.reshape(b, n, k, c)


class PositionWiseFeedForward(nn.Module):
    num_hidden: int
    num_ff: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = jax.nn.gelu(nn.Dense(self.num_ff, name="W_in")(x), approximate=False)
        return nn.Dense(self.num_hidden, name="W_out")(h)


class EncLayer(nn.Module):
    """Node+edge message passing (reference EncLayer :602-647)."""

    num_hidden: int
    scale: float = 30.0

    @nn.compact
    def __call__(self, h_v, h_e, e_idx, mask_v, mask_attend):
        # Node update.
        h_ev = jnp.concatenate(
            [
                jnp.repeat(h_v[:, :, None, :], h_e.shape[2], axis=2),
                h_e,
                gather_nodes(h_v, e_idx),
            ],
            axis=-1,
        )
        m = nn.Dense(self.num_hidden, name="W1")(h_ev)
        m = nn.Dense(self.num_hidden, name="W2")(jax.nn.gelu(m, approximate=False))
        m = nn.Dense(self.num_hidden, name="W3")(jax.nn.gelu(m, approximate=False))
        m = m * mask_attend[..., None]
        dh = m.sum(axis=-2) / self.scale
        h_v = nn.LayerNorm(epsilon=LN_EPS, name="norm1")(h_v + dh)
        dh = PositionWiseFeedForward(self.num_hidden, self.num_hidden * 4, name="dense")(h_v)
        h_v = nn.LayerNorm(epsilon=LN_EPS, name="norm2")(h_v + dh)
        h_v = h_v * mask_v[..., None]

        # Edge update.
        h_ev = jnp.concatenate(
            [
                jnp.repeat(h_v[:, :, None, :], h_e.shape[2], axis=2),
                h_e,
                gather_nodes(h_v, e_idx),
            ],
            axis=-1,
        )
        m = nn.Dense(self.num_hidden, name="W11")(h_ev)
        m = nn.Dense(self.num_hidden, name="W12")(jax.nn.gelu(m, approximate=False))
        m = nn.Dense(self.num_hidden, name="W13")(jax.nn.gelu(m, approximate=False))
        h_e = nn.LayerNorm(epsilon=LN_EPS, name="norm3")(h_e + m)
        return h_v, h_e


class DecLayer(nn.Module):
    """Decoder message passing (reference DecLayer :650-689)."""

    num_hidden: int
    scale: float = 30.0

    @nn.compact
    def __call__(self, h_v, h_esv, mask_v):
        h_ev = jnp.concatenate(
            [jnp.repeat(h_v[:, :, None, :], h_esv.shape[2], axis=2), h_esv],
            axis=-1,
        )
        m = nn.Dense(self.num_hidden, name="W1")(h_ev)
        m = nn.Dense(self.num_hidden, name="W2")(jax.nn.gelu(m, approximate=False))
        m = nn.Dense(self.num_hidden, name="W3")(jax.nn.gelu(m, approximate=False))
        dh = m.sum(axis=-2) / self.scale
        h_v = nn.LayerNorm(epsilon=LN_EPS, name="norm1")(h_v + dh)
        dh = PositionWiseFeedForward(self.num_hidden, self.num_hidden * 4, name="dense")(h_v)
        h_v = nn.LayerNorm(epsilon=LN_EPS, name="norm2")(h_v + dh)
        return h_v * mask_v[..., None]


class ProteinFeatures(nn.Module):
    """Backbone -> k-NN edge features (reference ProteinFeatures :899-997)."""

    cfg: MPNNConfig

    @nn.compact
    def __call__(self, x, mask, residue_idx, chain_labels):
        """
        Args:
            x: [B, N, 4, 3] backbone atoms (N, CA, C, O).
            mask: [B, N].
            residue_idx: [B, N] (with chain gaps already applied).
            chain_labels: [B, N] integer chain ids.

        Returns:
            (edge features [B, N, K, edge_features], e_idx [B, N, K]).
        """
        cfg = self.cfg
        n_atoms, ca, c, o = x[:, :, 0], x[:, :, 1], x[:, :, 2], x[:, :, 3]
        bvec = ca - n_atoms
        cvec = c - ca
        avec = jnp.cross(bvec, cvec)
        # Virtual Cb (ideal tetrahedral construction; same constants as the
        # reference :947-950).
        cb = -0.58273431 * avec + 0.56802827 * bvec - 0.54067466 * cvec + ca

        # k-NN on Ca distances; masked pairs are filled with the row's max
        # VALID distance (the reference `_dist` convention, :916-924).
        # The fill value matters when a padded row has fewer than k valid
        # residues: the selected masked edges then carry RBF(D_max) rather
        # than RBF(huge)=0, and those leak into the decoder through mask_fw
        # (which only masks the source row) — with a 1e6 fill, short-row
        # log-probs diverged from the reference by up to ~0.5. WHICH of the
        # tied-at-D_max edges top_k returns is unspecified in torch (its CPU
        # pick can even drop a valid neighbor whose distance equals D_max),
        # so bitwise parity in that regime is ill-posed; lax.top_k's stable
        # lowest-index tie-break deterministically keeps every valid
        # neighbor first (see test_protein_mpnn_short_row_knn).
        mask2d = mask[:, :, None] * mask[:, None, :]
        d = mask2d * jnp.sqrt(
            jnp.sum((ca[:, :, None] - ca[:, None, :]) ** 2, -1) + 1e-6
        )
        d_adjust = d + (1.0 - mask2d) * jnp.max(d, axis=-1, keepdims=True)
        k = min(cfg.k_neighbors, x.shape[1])
        neg_d, e_idx = jax.lax.top_k(-d_adjust, k)
        d_neighbors = -neg_d

        atoms = {"N": n_atoms, "Ca": ca, "C": c, "O": o, "Cb": cb}
        # Exact reference RBF ordering (:958-984) — required for weight
        # conversion compatibility.
        pair_order = [
            ("Ca", "Ca"), ("N", "N"), ("C", "C"), ("O", "O"), ("Cb", "Cb"),
            ("Ca", "N"), ("Ca", "C"), ("Ca", "O"), ("Ca", "Cb"), ("N", "C"),
            ("N", "O"), ("N", "Cb"), ("Cb", "C"), ("Cb", "O"), ("O", "C"),
            ("N", "Ca"), ("C", "Ca"), ("O", "Ca"), ("Cb", "Ca"), ("C", "N"),
            ("O", "N"), ("Cb", "N"), ("C", "Cb"), ("O", "Cb"), ("C", "O"),
        ]
        rbfs = [_rbf(d_neighbors, cfg.num_rbf)]
        for a_name, b_name in pair_order[1:]:
            a, b = atoms[a_name], atoms[b_name]
            dd = jnp.sqrt(
                jnp.sum((a[:, :, None] - b[:, None, :]) ** 2, -1) + 1e-6
            )
            d_nb = jnp.take_along_axis(dd, e_idx, axis=2)
            rbfs.append(_rbf(d_nb, cfg.num_rbf))
        rbf_all = jnp.concatenate(rbfs, axis=-1)

        offset = residue_idx[:, :, None] - residue_idx[:, None, :]
        offset = jnp.take_along_axis(offset, e_idx, axis=2)
        same_chain = (
            chain_labels[:, :, None] == chain_labels[:, None, :]
        ).astype(jnp.int32)
        e_chains = jnp.take_along_axis(same_chain, e_idx, axis=2)
        # Positional encoding (reference PositionalEncodings :704-716):
        # clipped offset one-hot, with a dedicated "different chain" bin.
        mrf = cfg.max_relative_feature
        dclip = jnp.clip(offset + mrf, 0, 2 * mrf) * e_chains + (
            1 - e_chains
        ) * (2 * mrf + 1)
        d_onehot = jax.nn.one_hot(dclip, 2 * mrf + 2)
        e_pos = nn.Dense(cfg.num_positional_embeddings, name="pos_linear")(d_onehot)

        e = jnp.concatenate([e_pos, rbf_all], axis=-1)
        e = nn.Dense(cfg.edge_features, use_bias=False, name="edge_embedding")(e)
        e = nn.LayerNorm(epsilon=LN_EPS, name="norm_edges")(e)
        return e, e_idx


def _normalize(v: Array, axis: int = -1, eps: float = 1e-12) -> Array:
    """torch F.normalize semantics: v / max(||v||, eps)."""
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, eps)


def _rot_to_quat_xyzw(r: Array) -> Array:
    """[..., 3, 3] rotations -> [..., 4] quaternions in [x,y,z,w] order.

    Bit-for-bit port of the reference's featurizer-internal
    `CA_ProteinFeatures._quaternions` (`protein_mpnn_utils.py:740-766`) —
    NOTE this deviates from the repo-wide [w,x,y,z] convention on purpose:
    the quaternion is an MPNN *edge feature*, so the released-weight
    contract fixes its layout (sign-magnitude Shepperd variant, xyzw).
    """
    rxx, ryy, rzz = r[..., 0, 0], r[..., 1, 1], r[..., 2, 2]
    mag = 0.5 * jnp.sqrt(jnp.abs(1.0 + jnp.stack(
        [rxx - ryy - rzz, -rxx + ryy - rzz, -rxx - ryy + rzz], axis=-1)))
    signs = jnp.sign(jnp.stack(
        [r[..., 2, 1] - r[..., 1, 2],
         r[..., 0, 2] - r[..., 2, 0],
         r[..., 1, 0] - r[..., 0, 1]], axis=-1))
    xyz = signs * mag
    w = jnp.sqrt(jax.nn.relu(1.0 + rxx + ryy + rzz))[..., None] / 2.0
    return _normalize(jnp.concatenate([xyz, w], axis=-1))


class CAProteinFeatures(nn.Module):
    """CA-only featurizer — the reference CLI's `--ca_only` path
    (`CA_ProteinFeatures`, `protein_mpnn_utils.py:719-897`): 9 RBF blocks
    over (prev, self, next) CA pairs plus 7 orientation features per
    k-NN edge (local-frame unit displacement + frame-to-frame quaternion
    from virtual CA frames). The reference's `node_embedding`/
    `norm_nodes` (and the model-level `W_v`) are initialized but never
    used by its forward, so they are omitted here and dropped by the
    weight converter."""

    cfg: MPNNConfig

    @nn.compact
    def __call__(self, x, mask, residue_idx, chain_labels):
        cfg = self.cfg
        ca = x[:, :, 1] if x.ndim == 4 else x  # [B, N, 3]
        b, n = ca.shape[:2]

        # Masked pairs filled with the row's max VALID distance before
        # top_k (reference CA `_dist`, :818-826 — same convention as the
        # non-CA ProteinFeatures above); keeps short padded rows
        # (valid_count < k) parity-exact, see the note there.
        mask2d = mask[:, :, None] * mask[:, None, :]
        d = mask2d * jnp.sqrt(
            jnp.sum((ca[:, :, None] - ca[:, None, :]) ** 2, -1) + 1e-6
        )
        d_adjust = d + (1.0 - mask2d) * jnp.max(d, axis=-1, keepdims=True)
        k = min(cfg.k_neighbors, n)
        neg_d, e_idx = jax.lax.top_k(-d_adjust, k)
        d_neighbors = -neg_d

        # Ca_0 / Ca_2: previous/next CA with zero boundary rows
        # (reference :852-856).
        ca_prev = jnp.pad(ca[:, :-1], ((0, 0), (1, 0), (0, 0)))
        ca_next = jnp.pad(ca[:, 1:], ((0, 0), (0, 1), (0, 0)))

        def rbf_pair(a, c):
            dd = jnp.sqrt(
                jnp.sum((a[:, :, None] - c[:, None, :]) ** 2, -1) + 1e-6
            )
            return _rbf(jnp.take_along_axis(dd, e_idx, axis=2), cfg.num_rbf)

        # Exact reference block order (:858-872).
        rbfs = [
            _rbf(d_neighbors, cfg.num_rbf),          # Ca1-Ca1
            rbf_pair(ca_prev, ca_prev), rbf_pair(ca_next, ca_next),
            rbf_pair(ca_prev, ca), rbf_pair(ca_prev, ca_next),
            rbf_pair(ca, ca_prev), rbf_pair(ca, ca_next),
            rbf_pair(ca_next, ca_prev), rbf_pair(ca_next, ca),
        ]
        rbf_all = jnp.concatenate(rbfs, axis=-1)

        # Orientation features (reference _orientations_coarse :768-816;
        # the AD_features output is unused by the CA forward).
        dx = ca[:, 1:] - ca[:, :-1]
        dx_norm = jnp.linalg.norm(dx, axis=-1)
        no_jump = ((dx_norm > 3.6) & (dx_norm < 4.0)).astype(ca.dtype)
        u = _normalize(dx * no_jump[..., None])       # [B, N-1, 3]
        u_2, u_1 = u[:, :-2], u[:, 1:-1]              # [B, N-3, 3]
        n_2 = _normalize(jnp.cross(u_2, u_1))
        o_1 = _normalize(u_2 - u_1)
        frame = jnp.stack(
            [o_1, n_2, jnp.cross(o_1, n_2)], axis=2
        )                                              # [B, N-3, 3, 3]
        o_flat = jnp.pad(
            frame.reshape(b, n - 3, 9), ((0, 0), (1, 2), (0, 0))
        )                                              # [B, N, 9]
        o_neighbors = gather_nodes(o_flat, e_idx).reshape(b, n, k, 3, 3)
        x_neighbors = gather_nodes(ca, e_idx)          # [B, N, K, 3]
        o_mat = o_flat.reshape(b, n, 3, 3)
        dxn = x_neighbors - ca[:, :, None]
        du = _normalize(jnp.einsum("bnij,bnkj->bnki", o_mat, dxn))
        r_rel = jnp.einsum("bnji,bnkjl->bnkil", o_mat, o_neighbors)
        o_features = jnp.concatenate(
            [du, _rot_to_quat_xyzw(r_rel)], axis=-1
        )                                              # [B, N, K, 7]

        offset = residue_idx[:, :, None] - residue_idx[:, None, :]
        offset = jnp.take_along_axis(offset, e_idx, axis=2)
        same_chain = (
            chain_labels[:, :, None] == chain_labels[:, None, :]
        ).astype(jnp.int32)
        e_chains = jnp.take_along_axis(same_chain, e_idx, axis=2)
        mrf = cfg.max_relative_feature
        dclip = jnp.clip(offset + mrf, 0, 2 * mrf) * e_chains + (
            1 - e_chains
        ) * (2 * mrf + 1)
        d_onehot = jax.nn.one_hot(dclip, 2 * mrf + 2)
        e_pos = nn.Dense(cfg.num_positional_embeddings, name="pos_linear")(d_onehot)

        e = jnp.concatenate([e_pos, rbf_all, o_features], axis=-1)
        e = nn.Dense(cfg.edge_features, use_bias=False, name="edge_embedding")(e)
        e = nn.LayerNorm(epsilon=LN_EPS, name="norm_edges")(e)
        return e, e_idx


class ProteinMPNN(nn.Module):
    """Graph-conditioned autoregressive sequence model."""

    cfg: MPNNConfig = MPNNConfig()

    def setup(self):
        cfg = self.cfg
        feat_cls = CAProteinFeatures if cfg.ca_only else ProteinFeatures
        self.features = feat_cls(cfg, name="features")
        self.w_e = nn.Dense(cfg.hidden_dim, name="W_e")
        self.w_s = nn.Embed(cfg.num_letters, cfg.hidden_dim, name="W_s")
        self.enc_layers = [
            EncLayer(cfg.hidden_dim, name=f"enc_{i}")
            for i in range(cfg.num_encoder_layers)
        ]
        self.dec_layers = [
            DecLayer(cfg.hidden_dim, name=f"dec_{i}")
            for i in range(cfg.num_decoder_layers)
        ]
        self.w_out = nn.Dense(cfg.num_letters, name="W_out")

    def encode(self, x, mask, residue_idx, chain_labels):
        e, e_idx = self.features(x, mask, residue_idx, chain_labels)
        h_v = jnp.zeros(e.shape[:2] + (self.cfg.hidden_dim,), e.dtype)
        h_e = self.w_e(e)
        mask_attend = (
            mask[:, :, None]
            * jnp.take_along_axis(
                jnp.broadcast_to(mask[:, None, :], (mask.shape[0],) + (mask.shape[1],) * 2),
                e_idx,
                axis=2,
            )
        )
        for layer in self.enc_layers:
            h_v, h_e = layer(h_v, h_e, e_idx, mask, mask_attend)
        return h_v, h_e, e_idx

    def _order_masks(self, decoding_order, e_idx, mask):
        """mask_bw[b,i,k] = 1 if neighbor e_idx[b,i,k] decodes before i."""
        n = decoding_order.shape[-1]
        rank = jnp.argsort(decoding_order, axis=-1)  # position -> decode step
        before = rank[:, :, None] > rank[:, None, :]  # [B, N, N]: j before i
        mask_attend = jnp.take_along_axis(
            before.astype(jnp.float32), e_idx, axis=2
        )[..., None]
        mask_1d = mask[:, :, None, None]
        return mask_1d * mask_attend, mask_1d * (1.0 - mask_attend)

    def decoder_logits(
        self, h_v_enc, h_e, e_idx, mask, seq, decoding_order,
        seq_valid=None,
    ):
        """Runs the full decoder stack under the order mask; [B, N, 21].

        `seq_valid` [B, N] zeroes the sequence embedding of not-yet-
        committed positions (the reference keeps h_S = 0 until a token is
        scattered, `protein_mpnn_utils.py:1168`). Only observable for
        tied sampling: a tied group's later members are order-visible to
        each other before any of them is committed.
        """
        h_s = self.w_s(seq)
        if seq_valid is not None:
            h_s = h_s * seq_valid[..., None].astype(h_s.dtype)
        h_es = jnp.concatenate([h_e, gather_nodes(h_s, e_idx)], axis=-1)
        zeros = jnp.zeros_like(h_s)
        h_ex_encoder = jnp.concatenate([h_e, gather_nodes(zeros, e_idx)], axis=-1)
        h_exv_encoder = jnp.concatenate(
            [h_ex_encoder, gather_nodes(h_v_enc, e_idx)], axis=-1
        )
        mask_bw, mask_fw = self._order_masks(decoding_order, e_idx, mask)
        h_exv_encoder_fw = mask_fw * h_exv_encoder
        h_v = h_v_enc
        for layer in self.dec_layers:
            h_esv = jnp.concatenate([h_es, gather_nodes(h_v, e_idx)], axis=-1)
            h_esv = mask_bw * h_esv + h_exv_encoder_fw
            h_v = layer(h_v, h_esv, mask)
        return self.w_out(h_v)

    def __call__(self, x, seq, mask, residue_idx, chain_labels, decoding_order):
        """Teacher-forced log-probs [B, N, 21] (reference forward :1036-1080)."""
        h_v, h_e, e_idx = self.encode(x, mask, residue_idx, chain_labels)
        logits = self.decoder_logits(h_v, h_e, e_idx, mask, seq, decoding_order)
        return jax.nn.log_softmax(logits, axis=-1)

    def unconditional_log_probs(self, x, mask, residue_idx, chain_labels):
        """One-shot p(s_i | structure) for every position, [B, N, 21].

        Mirrors the reference's `unconditional_probs`
        (`ProteinMPNN/protein_mpnn_utils.py:1332-1362`): the backward order
        mask is identically zero, so every decoder layer sees only the
        forward (encoder/structure) context and no sequence embedding is
        ever visible — a single decoder pass instead of N AR steps.
        """
        h_v, h_e, e_idx = self.encode(x, mask, residue_idx, chain_labels)
        h_s0 = jnp.zeros(h_v.shape[:2] + (self.cfg.hidden_dim,), h_v.dtype)
        h_ex = jnp.concatenate([h_e, gather_nodes(h_s0, e_idx)], axis=-1)
        h_exv = jnp.concatenate([h_ex, gather_nodes(h_v, e_idx)], axis=-1)
        h_exv_fw = mask[:, :, None, None] * h_exv
        for layer in self.dec_layers:
            h_v = layer(h_v, h_exv_fw, mask)
        return jax.nn.log_softmax(self.w_out(h_v), axis=-1)



@functools.partial(jax.jit, static_argnames=("model", "backbone_noise"))
def score_sequences(
    model: ProteinMPNN,
    params,
    x: Array,
    seq: Array,
    mask: Array,
    residue_idx: Array,
    chain_labels: Array,
    decoding_order: Array,
    score_mask: Array | None = None,
    backbone_noise: float = 0.0,
    noise_key: Array | None = None,
):
    """Per-sequence NLL under one teacher-forced decoding order.

    The reference CLI's `--score_only` mode
    (`ProteinMPNN/protein_mpnn_run.py`, `_scores` helper): score =
    mean over scored positions of -log p(s_i | s_<i(order), structure).
    `score_mask` restricts scoring (the reference uses mask * chain_M).
    `backbone_noise` adds iid Gaussian noise to the input coordinates
    (the reference's `--backbone_noise` / `ProteinFeatures.augment_eps`,
    `protein_mpnn_utils.py:943-944`); requires `noise_key`.
    Returns {'log_probs' [B,N,21], 'nll' [B,N], 'score' [B]}.
    """
    if backbone_noise > 0.0:
        if noise_key is None:
            raise ValueError("backbone_noise > 0 requires noise_key")
        x = x + backbone_noise * jax.random.normal(noise_key, x.shape, x.dtype)
    lp = model.apply(
        {"params": params}, x, seq, mask, residue_idx, chain_labels,
        decoding_order,
    )
    nll = -jnp.take_along_axis(lp, seq[..., None], axis=-1)[..., 0]
    m = mask if score_mask is None else mask * score_mask
    score = (nll * m).sum(-1) / jnp.maximum(m.sum(-1), 1e-8)
    return {"log_probs": lp, "nll": nll, "score": score}


@functools.partial(jax.jit, static_argnames=("model",))
def unconditional_probs(
    model: ProteinMPNN,
    params,
    x: Array,
    mask: Array,
    residue_idx: Array,
    chain_labels: Array,
) -> Array:
    """One-shot structure-only log-probs (reference CLI
    `--unconditional_probs_only`); see
    `ProteinMPNN.unconditional_log_probs`."""
    return model.apply(
        {"params": params}, x, mask, residue_idx, chain_labels,
        method=ProteinMPNN.unconditional_log_probs,
    )


@functools.partial(jax.jit, static_argnames=("model", "backbone_only"))
def conditional_probs(
    model: ProteinMPNN,
    params,
    x: Array,
    seq: Array,
    mask: Array,
    residue_idx: Array,
    chain_labels: Array,
    randn: Array,
    backbone_only: bool = False,
) -> Array:
    """Per-position conditionals p(s_i | s_others, structure), [B, N, 21].

    Mirrors the reference's `conditional_probs`
    (`ProteinMPNN/protein_mpnn_utils.py:1272-1330`, CLI
    `--conditional_probs_only[_backbone]`): for each target i a decoding
    order is drawn from the shared noise `randn` via
    argsort((order_mask + 1e-4) * |randn|) with i forced last — so i
    conditions on every other committed token — and row i of that
    teacher-forced decoder pass is kept. `backbone_only=True` instead
    forces i first (:1305-1307), giving structure-only probabilities for
    row i. The encoder runs once; the N decoder passes run under
    `lax.map` (bounded memory; same O(N) decoder cost as the reference's
    python loop, but jitted and batched over B).
    """
    h_v, h_e, e_idx = model.apply(
        {"params": params}, x, mask, residue_idx, chain_labels,
        method=ProteinMPNN.encode,
    )
    n = mask.shape[-1]
    absr = jnp.abs(randn)

    def one(idx):
        if backbone_only:
            order_mask = jnp.ones((n,), absr.dtype).at[idx].set(0.0)
        else:
            order_mask = jnp.zeros((n,), absr.dtype).at[idx].set(1.0)
        order = jnp.argsort((order_mask[None] + 1e-4) * absr, axis=-1)
        logits = model.apply(
            {"params": params}, h_v, h_e, e_idx, mask, seq, order,
            method=ProteinMPNN.decoder_logits,
        )
        return jax.nn.log_softmax(logits, axis=-1)[:, idx]  # [B, 21]

    out = jax.lax.map(one, jnp.arange(n))  # [N, B, 21]
    return jnp.swapaxes(out, 0, 1)


def random_decoding_order(key: jax.Array, mask: Array) -> Array:
    """Random order over valid positions; masked positions decode first
    (they only ever contribute encoder features), matching the reference's
    argsort((chain_M + eps) * |randn|) trick (:1063)."""
    noise = jnp.abs(jax.random.normal(key, mask.shape))
    return jnp.argsort((mask + 1e-4) * noise, axis=-1)


def _tie_contiguous_order(decoding_order: Array, tie_rep: Array) -> Array:
    """Reorders a decoding order so tied groups decode contiguously.

    `tie_rep[i]` is the representative position index of i's tie group
    (i itself when untied). Groups are placed at the rank of their
    earliest member, preserving within-group relative order — the same
    reordering the reference builds in python
    (`protein_mpnn_utils.py:1189-1196` tied_sample new_decoding_order).
    """
    b, n = decoding_order.shape
    ranks = jnp.argsort(decoding_order, axis=-1)  # position -> rank
    group_min = jax.vmap(
        lambda r: jax.ops.segment_min(r, tie_rep, num_segments=n)
    )(ranks)  # [B, n] min rank per group id (rep position)
    group_rank = jnp.take_along_axis(
        group_min, jnp.broadcast_to(tie_rep[None], (b, n)), axis=-1
    )
    return jnp.argsort(group_rank * n + ranks, axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "temperature", "omit_x", "pssm_multi",
        "pssm_bias_flag", "pssm_log_odds_flag", "backbone_noise",
    ),
)
def sample_sequences(
    model: ProteinMPNN,
    params,
    key: jax.Array,
    x: Array,
    mask: Array,
    residue_idx: Array,
    chain_labels: Array,
    temperature: float = 0.1,
    omit_x: bool = True,
    fixed_mask: Array | None = None,
    input_seq: Array | None = None,
    bias_aa: Array | None = None,
    bias_by_res: Array | None = None,
    omit_aa: Array | None = None,
    omit_aa_mask: Array | None = None,
    tie_rep: Array | None = None,
    tied_beta: Array | None = None,
    decoding_order: Array | None = None,
    pssm_coef: Array | None = None,
    pssm_bias: Array | None = None,
    pssm_multi: float = 0.0,
    pssm_log_odds_mask: Array | None = None,
    pssm_bias_flag: bool = False,
    pssm_log_odds_flag: bool = False,
    backbone_noise: float | None = None,
) -> Dict[str, Array]:
    """Autoregressive sampling. Returns {'seq': [B, N], 'log_probs': ...}.

    Sampling options mirror the reference `ProteinMPNN.sample` /
    `tied_sample` kwargs (`protein_mpnn_utils.py:1083,1175`):

    * ``bias_aa`` [21]: global per-AA bias, applied as ``bias/temperature``
      inside the softmax (reference ``bias_AAs_np``).
    * ``bias_by_res`` [B, N, 21]: per-residue bias, also ``/temperature``.
    * ``omit_aa`` [21] 0/1: globally banned letters; -1e8 logit penalty NOT
      divided by temperature (reference ``omit_AAs_np`` semantics).
    * ``omit_aa_mask`` [B, N, 21] 0/1: per-position bans. The reference
      zeroes+renormalizes probs; adding -1e8 to the logits is the same
      distribution.
    * ``tie_rep`` [N] int32 + ``tied_beta`` [N]: tied positions (homo-
      oligomer design). ``tie_rep[i]`` names i's group representative;
      group logits are the tied_beta-weighted sum over members, one token
      is drawn and committed to every member, and the decoding order is
      rearranged so groups decode contiguously (reference ``tied_sample``).
      Known deviation: per-position arrays (``pssm_*``, ``bias_by_res``,
      ``omit_aa_mask``) are gathered at the group's first-decoded member,
      while the reference's ``tied_sample`` gathers at the last member of
      its ``t_list``; identical whenever the rows agree within a group
      (the homo-oligomer case these options exist for).
    * ``decoding_order`` [B, N]: explicit order override (reference
      ``randn`` argument); default draws the same argsort-noise order.
    * ``pssm_coef`` [B, N] + ``pssm_bias`` [B, N, 21] + ``pssm_multi``
      (``--pssm_bias_flag``): probability-simplex blend
      ``(1 - multi*coef)*p + multi*coef*pssm_bias`` applied AFTER the
      softmax (`protein_mpnn_utils.py` sample, pssm_bias_flag branch) —
      not expressible as a logit bias, so this path samples from
      ``log(probs)``.
    * ``pssm_log_odds_mask`` [B, N, 21] 0/1 (``--pssm_log_odds_flag``):
      multiplicative prob masking with the reference's 0.001 leakage,
      ``p' = (p*m + 0.001*p) / sum``.
    * ``backbone_noise``: iid Gaussian coordinate augmentation, the
      reference's ``--backbone_noise`` / ``ProteinFeatures.augment_eps``
      (`protein_mpnn_utils.py:943-944`).

    When either pssm flag is set, ``omit_aa_mask`` is applied AFTER the
    pssm ops as the reference does (zero + renormalize), so pssm mass
    cannot leak back onto banned letters.

    fixed_mask/input_seq implement partial redesign (the reference CLI's
    fixed-positions feature): fixed positions keep their input token and
    decode first, so every redesigned position conditions on them — the
    same ordering trick as the reference's chain_M argsort (:1099).

    Each scan step recomputes the decoder at full width and commits the
    active position (see module docstring for why this is the right TPU
    trade).
    """
    b, n = mask.shape
    if pssm_bias_flag and (pssm_coef is None or pssm_bias is None):
        raise ValueError(
            "pssm_bias_flag=True requires pssm_coef [B,N] and "
            "pssm_bias [B,N,21]"
        )
    if pssm_log_odds_flag and pssm_log_odds_mask is None:
        raise ValueError(
            "pssm_log_odds_flag=True requires pssm_log_odds_mask [B,N,21]"
        )
    if backbone_noise is None:
        # The config's augment_eps (reference model kwarg); flax modules
        # are pure, so the noise is drawn here with an explicit key.
        backbone_noise = model.cfg.augment_eps
    if backbone_noise > 0.0:
        # The noise key is only split off when noise is actually drawn, so
        # backbone_noise=0 callers keep the original 2-way key stream
        # (seed-pinned results from before this option stay reproducible).
        key_order, key_scan, key_noise = jax.random.split(key, 3)
        x = x + backbone_noise * jax.random.normal(key_noise, x.shape, x.dtype)
    else:
        key_order, key_scan = jax.random.split(key)
    design_mask = mask
    if fixed_mask is not None:
        design_mask = mask * (1.0 - fixed_mask)
    if decoding_order is None:
        decoding_order = random_decoding_order(key_order, design_mask)
    if tie_rep is not None:
        decoding_order = _tie_contiguous_order(decoding_order, tie_rep)

    def apply_encode(p, *a):
        return model.apply({"params": p}, *a, method=ProteinMPNN.encode)

    h_v, h_e, e_idx = apply_encode(params, x, mask, residue_idx, chain_labels)

    gbias = jnp.zeros((model.cfg.num_letters,))
    if omit_x:
        gbias = gbias.at[MPNN_ALPHABET.index("X")].set(-1e9)
    if omit_aa is not None:
        gbias = gbias + omit_aa * -1e8
    if bias_aa is not None:
        gbias = gbias + bias_aa / temperature

    use_pssm = pssm_bias_flag or pssm_log_odds_flag

    def step(carry, t):
        seq, committed, all_probs, k = carry
        k, sub = jax.random.split(k)
        logits = model.apply(
            {"params": params},
            h_v, h_e, e_idx, mask, seq, decoding_order,
            committed.astype(jnp.float32),
            method=ProteinMPNN.decoder_logits,
        )
        pos = decoding_order[:, t]  # [B]

        def take_pos(arr):  # [B, N, C] -> [B, C] at pos
            return jnp.take_along_axis(
                arr, pos[:, None, None].repeat(arr.shape[-1], -1), axis=1
            )[:, 0]

        if tie_rep is not None:
            rep = tie_rep[pos]  # [B] group id of the active position
            group = tie_rep[None, :] == rep[:, None]  # [B, N]
            beta = jnp.ones(n) if tied_beta is None else tied_beta
            pos_logits = jnp.einsum(
                "bnc,bn->bc", logits, group * beta[None, :]
            )
        else:
            group = jax.nn.one_hot(pos, n, dtype=jnp.bool_)
            pos_logits = take_pos(logits)
        pos_logits = pos_logits / temperature + gbias
        if bias_by_res is not None:
            pos_logits = pos_logits + take_pos(bias_by_res) / temperature
        if not use_pssm:
            if omit_aa_mask is not None:
                pos_logits = pos_logits + take_pos(omit_aa_mask) * -1e8
            probs = jax.nn.softmax(pos_logits, axis=-1)
            tok = jax.random.categorical(sub, pos_logits, axis=-1)
        else:
            # The pssm ops act on the probability simplex (reference
            # sample(), pssm branches): convex blend then multiplicative
            # masking — neither is a logit bias, so sample from
            # log(probs) after applying them in the reference's order.
            probs = jax.nn.softmax(pos_logits, axis=-1)
            if pssm_bias_flag:
                coef = jnp.take_along_axis(pssm_coef, pos[:, None], axis=1)
                pb = take_pos(pssm_bias)
                w = pssm_multi * coef  # [B, 1]
                probs = (1.0 - w) * probs + w * pb
            if pssm_log_odds_flag:
                lm = take_pos(pssm_log_odds_mask)
                pm = probs * lm + probs * 1e-3
                probs = pm / jnp.sum(pm, axis=-1, keepdims=True)
            if omit_aa_mask is not None:
                pm = probs * (1.0 - take_pos(omit_aa_mask))
                probs = pm / jnp.maximum(
                    jnp.sum(pm, axis=-1, keepdims=True), 1e-30
                )
            tok = jax.random.categorical(
                sub, jnp.log(jnp.maximum(probs, 1e-36)), axis=-1
            )

        active = ~jnp.take_along_axis(committed, pos[:, None], axis=1)[:, 0]
        write = group & active[:, None]
        if fixed_mask is not None:
            write = write & (fixed_mask < 0.5)
        seq = jnp.where(write, tok[:, None], seq)
        # Per-step sampling distribution at every written position — the
        # reference's `all_probs` output (`--save_probs`).
        all_probs = jnp.where(
            write[:, :, None], probs.astype(jnp.float32)[:, None, :], all_probs
        )
        committed = committed | (group & active[:, None])
        return (seq, committed, all_probs, k), None

    seq0 = (
        jnp.zeros((b, n), jnp.int32) if input_seq is None else input_seq
    )
    committed0 = jnp.zeros((b, n), bool)
    probs0 = jnp.zeros((b, n, model.cfg.num_letters), jnp.float32)
    (seq, _, all_probs, _), _ = jax.lax.scan(
        step, (seq0, committed0, probs0, key_scan), jnp.arange(n)
    )

    log_probs = model.apply(
        {"params": params}, x, seq, mask, residue_idx, chain_labels, decoding_order
    )
    # Zero probs outside designed positions — the reference scatters
    # chain_mask_gathered * probs, so padding/fixed rows stay zero.
    all_probs = all_probs * design_mask[:, :, None]
    return {
        "seq": seq,
        "log_probs": log_probs,
        "decoding_order": decoding_order,
        "probs": all_probs,
    }


def seq_to_string(seq: Array, mask: Array) -> str:
    return "".join(
        MPNN_ALPHABET[int(s)] for s, m in zip(seq, mask) if m > 0.5
    )


def pssm_log_odds_mask_from(pssm_log_odds: Array, threshold: float) -> Array:
    """[..., 21] log-odds -> 0/1 mask (the reference CLI's
    `--pssm_threshold` host-side step, `protein_mpnn_run.py:230`)."""
    return (pssm_log_odds > threshold).astype(jnp.float32)


def make_sequence_designer(model: ProteinMPNN, params, temperature: float = 0.1,
                           **sample_kwargs):
    """Adapts ProteinMPNN to the InferenceRunner SequenceDesigner protocol.

    Extra keyword arguments (bias_aa, omit_aa, pssm_*, backbone_noise, ...)
    are forwarded to `sample_sequences` on every call."""
    import numpy as np

    def designer(atom37: "np.ndarray", num_seqs: int, seed: int):
        n = atom37.shape[0]
        x = jnp.asarray(atom37[None, :, [0, 1, 2, 4], :], jnp.float32)
        x = jnp.repeat(x, num_seqs, axis=0)
        mask = jnp.ones((num_seqs, n), jnp.float32)
        residue_idx = jnp.tile(jnp.arange(n, dtype=jnp.int32)[None], (num_seqs, 1))
        chains = jnp.zeros((num_seqs, n), jnp.int32)
        out = sample_sequences(
            model, params, jax.random.PRNGKey(seed), x, mask, residue_idx,
            chains, temperature=temperature, **sample_kwargs,
        )
        return [
            seq_to_string(np.asarray(out["seq"][i]), np.asarray(mask[i]))
            for i in range(num_seqs)
        ]

    return designer
