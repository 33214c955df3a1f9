"""PointTransformer-V3-style point encoder, redesigned for TPU.

Replaces the vendored Pointcept PTv3 + spconv + flash-attn stack the
reference uses as its Gaussian point refiner (reference:
src/models/point_transformer/pointtransformer_v3.py, point_encoder.py).

What is kept from the PTv3 design:
  * space-filling-curve serialization (z / z-trans / hilbert / hilbert-trans,
    ops/serialization.py) with the order alternating across blocks — the
    reference's order-shuffle trick (pointtransformer_v3.py:81-145);
  * patch attention: dense MHA inside groups of `patch_size` consecutive
    points along the curve (the enable_flash=false dense path,
    :467-483 — which is exactly an (G, P, C) batched attention, i.e. the
    MXU-native formulation);
  * U-Net encoder/decoder with pooling on the serialized order and skip
    connections (:618-759).

TPU-first redesigns (all static-shape; documented deviations):
  * sparse-conv CPE (spconv SubMConv3d, :555-561) -> depthwise conv along
    the serialized sequence (window 3). Curve locality makes serial
    neighbors spatial neighbors, and the op is a static depthwise conv
    instead of a hash-gather sparse conv. This is exactly the xCPE the
    PTv3 paper itself introduces as a drop-in for the spconv CPE where
    sparse-conv support is poor (arXiv:2312.10035, Sec. 4/Table 8 —
    "serial conv" performs on par); a literal SubMConv3d needs either a
    27-offset hash lookup (binary searches = log2(N) chained gathers per
    offset) or a dense voxel table ((~300)^3 cells rebuilt per stage) —
    both orders of magnitude slower than everything else in the refiner
    on TPU, for quality the upstream ablation shows to be noise-level.
  * SerializedPooling's dynamic grid merge (code >> bits, dynamic counts)
    -> fixed-window (4) max pooling over the curve order: constant 4x
    reduction, static shapes at every stage. Unpooling broadcasts parents
    back to their window + skip connection.
  * point counts are padded once to a multiple of patch_size * 4^depth and
    masked; padding never attends to real points.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import serialization as ser

POOL_WINDOW = 4


def invert_perm(perm: jnp.ndarray) -> jnp.ndarray:
    """Permutation inverse as an O(N) scatter — NOT a second argsort.
    (argsort is a bitonic network on TPU; at the refiner's 30k points the
    redundant inversion sorts were a measurable slice of serving time.)"""
    n = perm.shape[0]
    return jnp.zeros((n,), perm.dtype).at[perm].set(
        jnp.arange(n, dtype=perm.dtype))


class _SerialCpe(nn.Module):
    """`nn.Conv(dim, (3,), feature_group_count=dim)` twin as three shifted
    multiplies: identical params ('kernel' (3, 1, C), 'bias' (C,)), but the
    compute stays elementwise on the VPU — the depthwise conv forced a
    layout round-trip around every block (xprof: ~3 ms/block at the dec0
    scale for ~0 FLOPs)."""

    dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (N, C) -> (N, C), SAME padding along the curve axis."""
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 1, self.dim))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        k = kernel[:, 0, :]                            # (3, C)
        xp = jnp.pad(x, ((1, 1), (0, 0)))
        N = x.shape[0]
        return (xp[0:N] * k[0] + xp[1:N + 1] * k[1] + xp[2:N + 2] * k[2]
                + bias)


class _ProjGHPD(nn.Module):
    """`nn.DenseGeneral(features=(H, D))` twin (params 'kernel' (C, H, D),
    'bias' (H, D) — flax MHA's query/key/value layout) emitting (G, H, P, D)
    head-major directly from the projection dot."""

    heads: int
    head_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[-1]
        # 'heads' -> the 'model' mesh axis (parallel/mesh.LOGICAL_RULES):
        # head-parallel attention, Megatron column half
        kernel = self.param("kernel",
                            nn.with_logical_partitioning(
                                nn.initializers.lecun_normal(),
                                ("embed", "heads", None)),
                            (C, self.heads, self.head_dim))
        bias = self.param("bias",
                          nn.with_logical_partitioning(
                              nn.initializers.zeros_init(),
                              ("heads", None)),
                          (self.heads, self.head_dim))
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        y = jnp.einsum("gpc,chd->ghpd", x, kernel)
        return y + bias[None, :, None, :]


class _OutGPC(nn.Module):
    """`nn.DenseGeneral(features=C, axis=(-2, -1))` twin (params 'kernel'
    (H, D, C), 'bias' (C,) — flax MHA's out layout) consuming (G, H, P, D)
    head-major attention output."""

    out_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, y: jnp.ndarray) -> jnp.ndarray:
        H, D = y.shape[1], y.shape[3]
        # Megatron row half: contraction over sharded heads -> psum
        kernel = self.param("kernel",
                            nn.with_logical_partitioning(
                                nn.initializers.lecun_normal(),
                                ("heads", None, "embed")),
                            (H, D, self.out_dim))
        bias = self.param("bias",
                          nn.with_logical_partitioning(
                              nn.initializers.zeros_init(), ("embed",)),
                          (self.out_dim,))
        y, kernel, bias = nn.dtypes.promote_dtype(y, kernel, bias,
                                                  dtype=self.dtype)
        return jnp.einsum("ghpd,hdc->gpc", y, kernel) + bias


class _PatchAttention(nn.Module):
    """`nn.MultiHeadDotProductAttention` twin (identical param tree:
    query/key/value kernels (C, H, D) + biases, out (H, D, C)) for
    valid-first patch attention.

    On TPU with D in {64, 128} it routes through the Pallas flash kernel —
    the flax module materializes the (G, H, P, P) logits in HBM (~740 MB
    per dec0 block, xprof: attention there ran at ~9% MXU, memory-bound).
    Elsewhere it computes the same dense chain as flax (softmax in the
    compute dtype), with the head split folded into the projection dots.
    Mask comes in as (N,) valid-first; invalid rows are zeroed by the
    caller's residual mask.
    """

    dim: int
    heads: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, hq: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """hq: (G, P, C); mask: (G, P) bool or None (all valid).
        Returns (G, P, C)."""
        G, P, C = hq.shape
        H = self.heads
        D = C // H

        # head-major projections (the relayout-free form, see
        # models/transformer.py); submodule/param names match flax MHA
        # ({query,key,value}/kernel (C,H,D) + bias (H,D), out (H,D,C))
        q = _ProjGHPD(H, D, dtype=self.dtype, name="query")(hq)
        k = _ProjGHPD(H, D, dtype=self.dtype, name="key")(hq)
        v = _ProjGHPD(H, D, dtype=self.dtype, name="value")(hq)

        use_flash = (D in (64, 128) and P % 128 == 0
                     and jax.default_backend() == "tpu")
        if use_flash:
            from jax.experimental.pallas.ops.tpu import flash_attention as fa
            seg = None
            if mask is not None:
                ids = jnp.where(mask, 1, 2).astype(jnp.int32)  # (G, P)
                seg = fa.SegmentIds(q=ids, kv=ids)
            BLOCK = min(P, 512)
            bs = fa.BlockSizes(
                block_q=BLOCK, block_k_major=BLOCK, block_k=BLOCK,
                block_b=1, block_q_major_dkv=BLOCK,
                block_k_major_dkv=BLOCK, block_k_dkv=BLOCK,
                block_q_dkv=BLOCK, block_k_major_dq=BLOCK,
                block_k_dq=BLOCK, block_q_dq=BLOCK)
            out = fa.flash_attention(
                q, k, v, segment_ids=seg,
                sm_scale=float(1.0 / np.sqrt(D)), block_sizes=bs)
        else:
            # flax dot_product_attention numerics: q scaled by 1/sqrt(D),
            # big-negative mask, softmax in the compute dtype
            logits = jnp.einsum("ghqd,ghkd->ghqk", q / jnp.sqrt(D).astype(q.dtype), k)
            if mask is not None:
                big_neg = jnp.finfo(logits.dtype).min
                logits = jnp.where(mask[:, None, None, :], logits, big_neg)
            probs = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum("ghqk,ghkd->ghqd", probs, v)
        return _OutGPC(C, dtype=self.dtype, name="out")(out)


class SerialBlock(nn.Module):
    """xCPE (depthwise serial conv) + patch attention + MLP, pre-LN."""

    dim: int
    heads: int
    patch_size: int
    dtype: Optional[jnp.dtype] = None  # matmul compute dtype (params fp32)
    # Serving knob: tanh gelu. Exact erf (torch nn.GELU default,
    # pointtransformer_v3.py:515) stays the default for weight-import
    # parity; erf costs ~1.7x the MLP matmuls' time on the VPU at serving
    # N (tools/refiner_probe 2026-08-19).
    gelu_approx: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        """x: (N, C) curve-ordered; mask: (N,) bool valid."""
        N, C = x.shape
        # xCPE: depthwise window-3 conv along the curve (replaces spconv
        # CPE) computed as shifted multiplies (see _SerialCpe).
        h = _SerialCpe(self.dim, dtype=self.dtype, name="cpe")(x)
        x = x + h * mask[:, None]

        # Patch attention.
        p = min(self.patch_size, N)
        g = N // p
        h = nn.LayerNorm(name="ln1", dtype=self.dtype)(x)
        attn = _PatchAttention(self.dim, self.heads, dtype=self.dtype,
                               name="attn")(h.reshape(g, p, C),
                                            mask.reshape(g, p))
        x = x + attn.reshape(N, C) * mask[:, None]

        from .transformer import _dense
        h = nn.LayerNorm(name="ln2", dtype=self.dtype)(x)
        # Megatron MLP pair: hidden sharded over 'model' via 'mlp'
        h = _dense(self.dim * 4, ("embed", "mlp"), dtype=self.dtype,
                   name="mlp1")(h)
        # exact erf GELU by default (torch nn.GELU,
        # pointtransformer_v3.py:515 — weight-import parity); tanh knob for
        # serving (see field doc)
        h = nn.gelu(h, approximate=self.gelu_approx)
        h = _dense(self.dim, ("mlp", "embed"), dtype=self.dtype,
                   name="mlp2")(h)
        return x + h * mask[:, None]


class PTv3Encoder(nn.Module):
    """Serialized-attention point U-Net: (N, 3), (N, C_in) -> (N, out_dim)."""

    in_dim: int
    out_dim: int = 256
    enc_channels: Tuple[int, ...] = (32, 64, 128, 256, 512)
    enc_depths: Tuple[int, ...] = (2, 2, 2, 6, 2)
    enc_heads: Tuple[int, ...] = (2, 4, 8, 16, 32)
    dec_channels: Tuple[int, ...] = (256, 128, 256, 512)
    dec_depths: Tuple[int, ...] = (2, 2, 2, 2)
    dec_heads: Tuple[int, ...] = (4, 4, 8, 16)
    patch_size: int = 512
    grid_resolution: float = 100.0
    dtype: Optional[jnp.dtype] = None
    gelu_approx: bool = False  # see SerialBlock

    @nn.compact
    def __call__(self, points: jnp.ndarray, feats: jnp.ndarray) -> jnp.ndarray:
        """points: (N, 3), feats: (N, C_in). Single cloud; vmap for batch."""
        N = points.shape[0]
        S = len(self.enc_channels)

        # ---- pad to a static size divisible by patch & all poolings ----
        unit = self.patch_size  # every stage keeps multiples of patch via repad
        N_pad = int(np.ceil(N / unit) * unit)
        pad = N_pad - N
        pts = jnp.pad(points, ((0, pad), (0, 0)))
        x = jnp.pad(feats, ((0, pad), (0, 0)))
        mask = jnp.arange(N_pad) < N

        # ---- serialization orders at input resolution ----
        grid = ser.grid_coords(pts, self.grid_resolution)
        orders = {}
        for o in ser.ORDERS:
            code = ser.encode(grid, o)
            code = jnp.where(mask, code, jnp.int32(2 ** 30))  # padding last
            perm = jnp.argsort(code)
            orders[o] = (perm, invert_perm(perm))

        x = nn.Dense(self.enc_channels[0], dtype=self.dtype, name="embed")(x)

        def run_blocks(x, mask, stage, depths, heads, dim, prefix):
            # Composed reorders: features stay in the PREVIOUS block's curve
            # order and hop directly to the next order via one gather with
            # the composed permutation inv_cur[perm_next] — the
            # unsort-then-resort form costs 2 feature gathers per block
            # (depth+1 vs 2*depth; the (N, C) row gathers are a measured
            # slice of serving time, tools/gather_probe.py).
            cur_perm = cur_inv = None  # None == storage order
            for b in range(depths):
                o = ser.ORDERS[b % len(ser.ORDERS)]
                perm, inv = stage_orders[o]
                if cur_perm is None and perm is not None:
                    x = x[perm]
                elif cur_perm is not None and perm is None:
                    x = x[cur_inv]
                elif cur_perm is not None and perm is not None:
                    x = x[cur_inv[perm]]
                cur_perm, cur_inv = perm, inv
                # mask is SORT-INVARIANT: every order's codes put padding
                # last (code forced to 2^30), and every stage's storage is
                # valid-first (input pads at the end; pooled storage
                # inherits valid-first from the parent's z order), so
                # mask[perm] == mask — the per-block (N,) mask gathers were
                # descriptor-bound like a full feature gather (~20 of the
                # refiner's 74 gathers/rollout, xprof).
                x = SerialBlock(dim, heads, self.patch_size,
                                dtype=self.dtype,
                                gelu_approx=self.gelu_approx,
                                name=f"{prefix}_b{b}")(x, mask)
            if cur_perm is not None:
                x = x[cur_inv]
            return x

        # ---- encoder ----
        skips = []
        cur_pts, cur_mask = pts, mask
        stage_orders = orders
        for s in range(S):
            dim = self.enc_channels[s]
            if s > 0:
                # fixed-window pooling on the z-order curve
                perm, _ = stage_orders["z"]
                if perm is None:  # storage already z-ordered
                    xs, ps, ms = x, cur_pts, cur_mask
                else:
                    # cur_mask[perm] == cur_mask (sort-invariant, see above)
                    xs, ps, ms = x[perm], cur_pts[perm], cur_mask
                n2 = xs.shape[0] // POOL_WINDOW
                xs = nn.Dense(dim, dtype=self.dtype, name=f"pool{s}_proj")(xs)
                xw = xs.reshape(n2, POOL_WINDOW, dim)
                mw = ms.reshape(n2, POOL_WINDOW)
                xs = jnp.max(jnp.where(mw[..., None], xw, -jnp.inf), axis=1)
                xs = jnp.where(jnp.isfinite(xs), xs, 0.0)
                pw = ps.reshape(n2, POOL_WINDOW, 3)
                cnt = jnp.clip(mw.sum(-1, keepdims=True), 1)
                cur_pts = (pw * mw[..., None]).sum(1) / cnt
                cur_mask = mw.any(-1)
                x = xs
                # re-pad to a multiple of patch_size
                n_next = x.shape[0]
                n_tgt = int(np.ceil(n_next / self.patch_size) * self.patch_size) \
                    if n_next > self.patch_size else n_next
                if n_tgt != n_next:
                    extra = n_tgt - n_next
                    x = jnp.pad(x, ((0, extra), (0, 0)))
                    cur_pts = jnp.pad(cur_pts, ((0, extra), (0, 0)))
                    cur_mask = jnp.pad(cur_mask, (0, extra))
                # Pooled storage is ALREADY z-curve-ordered: 4-windows of a
                # z-sorted sequence pool to centroids whose curve prefixes
                # stay sorted (PTv3's own code>>bits pooling relies on the
                # same prefix property, pointtransformer_v3.py:653-672) —
                # the z order is the identity, no 30k-point argsort.
                stage_orders = {"z": (None, None)}
                grid = ser.grid_coords(cur_pts, self.grid_resolution)
                for o in ser.ORDERS:
                    if o == "z":
                        continue
                    code = ser.encode(grid, o)
                    code = jnp.where(cur_mask, code, jnp.int32(2 ** 30))
                    p = jnp.argsort(code)
                    stage_orders[o] = (p, invert_perm(p))
            x = run_blocks(x, cur_mask, s, self.enc_depths[s],
                           self.enc_heads[s], dim, f"enc{s}")
            skips.append((x, cur_pts, cur_mask, stage_orders))

        # ---- decoder ----
        for d in range(S - 2, -1, -1):
            skip_x, skip_pts, skip_mask, skip_orders = skips[d]
            dim = self.dec_channels[d] if d < len(self.dec_channels) else skip_x.shape[-1]
            # unpool: broadcast each parent back to its 4-window children on
            # the z-curve of the PARENT stage construction
            child_sorted_n = skip_x.shape[0]
            # children were pooled from the first parent_kept = child_n//4 groups
            up = jnp.repeat(x, POOL_WINDOW, axis=0)[: child_sorted_n]
            # undo the child-stage z sort (identity for pooled stages)
            _, child_inv = skip_orders["z"]
            if child_inv is not None:
                up = up[child_inv]
            x = nn.Dense(dim, dtype=self.dtype, name=f"dec{d}_proj_up")(up) + \
                nn.Dense(dim, dtype=self.dtype, name=f"dec{d}_proj_skip")(skip_x)
            stage_orders = skip_orders
            x = run_blocks(x, skip_mask, d,
                           self.dec_depths[d] if d < len(self.dec_depths) else 1,
                           self.dec_heads[d] if d < len(self.dec_heads) else 4,
                           dim, f"dec{d}")

        x = nn.Dense(self.out_dim, dtype=self.dtype, name="head")(x)
        return x[:N].astype(jnp.float32)


class PointRefiner(nn.Module):
    """(B, N, 3) points + (B, N, C) features -> (B, N, out_dim) — the
    PTv3Encoder wrapper interface (reference point_encoder.py:25-39)."""

    in_dim: int
    out_dim: int = 256
    enc_channels: Tuple[int, ...] = (32, 64, 128, 256, 512)
    enc_depths: Tuple[int, ...] = (2, 2, 2, 6, 2)
    enc_heads: Tuple[int, ...] = (2, 4, 8, 16, 32)
    dec_channels: Tuple[int, ...] = (256, 128, 256, 512)
    dec_depths: Tuple[int, ...] = (2, 2, 2, 2)
    dec_heads: Tuple[int, ...] = (4, 4, 8, 16)
    patch_size: int = 512
    grid_resolution: float = 100.0
    dtype: Optional[jnp.dtype] = None
    gelu_approx: bool = False  # see SerialBlock

    @nn.compact
    def __call__(self, points: jnp.ndarray, feats: jnp.ndarray) -> jnp.ndarray:
        VmappedUNet = nn.vmap(
            PTv3Encoder,
            in_axes=0, out_axes=0,
            variable_axes={"params": None},
            split_rngs={"params": False},
        )
        return VmappedUNet(
            in_dim=self.in_dim, out_dim=self.out_dim,
            enc_channels=self.enc_channels, enc_depths=self.enc_depths,
            enc_heads=self.enc_heads, dec_channels=self.dec_channels,
            dec_depths=self.dec_depths, dec_heads=self.dec_heads,
            patch_size=self.patch_size, grid_resolution=self.grid_resolution,
            dtype=self.dtype, gelu_approx=self.gelu_approx,
            name="unet")(points, feats)


def build_point_refiner(cfg) -> PointRefiner:
    return PointRefiner(
        in_dim=cfg.triplane_feature_dim * 3,
        out_dim=cfg.ptv3_output_dim,
        enc_channels=tuple(cfg.ptv3_enc_channels),
        enc_depths=tuple(cfg.ptv3_enc_depths),
        enc_heads=tuple(cfg.ptv3_enc_heads),
        dec_channels=tuple(cfg.ptv3_dec_channels),
        dec_depths=tuple(cfg.ptv3_dec_depths),
        dec_heads=tuple(cfg.ptv3_dec_heads),
        patch_size=cfg.ptv3_patch_size,
        grid_resolution=float(cfg.ptv3_grid_resolution),
        dtype=(jnp.bfloat16 if getattr(cfg, "compute_dtype", None) ==
               "bfloat16" else None),
        gelu_approx=bool(getattr(cfg, "gelu_approx", False)),
    )
