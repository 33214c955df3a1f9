"""Winograd F(2x2, 3x3) convolution as a Pallas TPU kernel.

The triplane upsampler's hot convs are 3x3, C=K=256, bf16, at 256^2 dense
planes and 18^2/20^2 sparse tile windows (reference renderer.py:348-417 uses
plain nn.Conv2d; cuDNN picks Winograd there — on TPU, XLA lowers to direct
MXU convolution, so the 2.25x MAC reduction must be hand-written).

Design (v5e):
  * F(2x2,3x3): each 2x2 output tile needs a 4x4 input window (stride 2).
    Y = A^T [ (G w G^T) . (B^T d B) ] A per tile; batching the elementwise
    product over tiles turns it into 16 (tiles, C) @ (C, K) MXU matmuls —
    4/9 of the direct conv MACs.
  * Layout: both phase pairs are peeled by FREE reshapes of the NHWC
    array — x is viewed as (NB, PH, 2, PW, 2C): the W phase rides the
    lane dim (slices at multiples of C), the H phase is its own unit dim.
    Every in-kernel tap and store is a static unit-stride slice (Mosaic
    rejects strided slices on >2D operands — they lower as gathers). No
    relayout pass in HBM on either side.
  * The +1 halo pair-row between row-strips is fed by passing the SAME
    input twice with different BlockSpecs (a th-pair-row main block and a
    1-pair-row tail block at offset (r+1)*th) — overlapping blocks
    without manual DMA.
  * Transforms run in the input dtype (bf16 on the serving path — the same
    rounding class as the direct bf16 conv); the 16 matmuls accumulate in
    fp32 (preferred_element_type), as does the A^T M A output transform.

Gradient: custom_vjp — backward differentiates the mathematically equal
XLA conv (conv VJP is itself a conv; exact at math level, bf16-rounding
different from a hand-written Winograd VJP would be either way).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# F(2x2,3x3) transform matrices (Lavin & Gray 2015).
_BT = np.array([[1, 0, -1, 0],
                [0, 1, 1, 0],
                [0, -1, 1, 0],
                [0, 1, 0, -1]], np.float32)
_G = np.array([[1, 0, 0],
               [0.5, 0.5, 0.5],
               [0.5, -0.5, 0.5],
               [0, 0, 1]], np.float32)
_AT = np.array([[1, 1, 1, 0],
                [0, 1, -1, -1]], np.float32)

# (row, sign) pairs of the two nonzeros in each B^T row: B^T has entries in
# {0, +-1}, so every transform position is a signed sum of two taps.
_BT_TAPS = ((0, 1.0, 2, -1.0),
            (1, 1.0, 2, 1.0),
            (1, -1.0, 2, 1.0),
            (1, 1.0, 3, -1.0))


def transform_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """w (3, 3, C, K) -> U (16, C, K) = G w G^T per (C, K), fp32."""
    u = jnp.einsum("pa,qb,abck->pqck", _G, _G, w.astype(jnp.float32))
    return u.reshape(16, w.shape[2], w.shape[3])


def _wino_kernel(xa_ref, xb_ref, u_ref, b_ref, out_ref, *, nb, th, wh, C, K,
                 mm_dtype):
    """One (nb images x th tile-rows x wh tile-cols) block.

    xa (nb, th, 2, PW, 2C) + xb (nb, 1, 2, PW, 2C) = the th+1 padded input
    pair-rows this strip needs; out (nb, th, 2, wh, 2K).
    """
    x = jnp.concatenate([xa_ref[...], xb_ref[...]], axis=1)
    _wino_core(x, u_ref, b_ref, out_ref, nb=nb, th=th, wh=wh, C=C, K=K,
               mm_dtype=mm_dtype)


def _wino_core(x, u_ref, b_ref, out_ref, *, nb, th, wh, C, K, mm_dtype):
    """Shared transform/matmul/inverse core on the assembled
    (nb, th+1, 2, PW, 2C) input window.

    Every tap is a static UNIT-STRIDE slice: the H phase is its own unit
    dim (free reshape outside), the W phase rides the lane dim — Mosaic
    rejects stride-2 slices on >2D operands (they lower as gathers;
    verified via cross-platform jax.export lowering)."""
    rows = nb * th * wh

    def d(r, s):
        # input tap (r, s) over all tiles: pair-row r//2 + i, H phase r%2,
        # pair-col s//2 + j, W phase = lane slice
        sl = x[:, r // 2:r // 2 + th, r % 2, s // 2:s // 2 + wh,
               (s % 2) * C:(s % 2) * C + C]
        return sl.reshape(rows, C).astype(mm_dtype)

    y = [[None, None], [None, None]]
    for p in range(4):
        r0, g0, r1, g1 = _BT_TAPS[p]
        R = [g0 * d(r0, s) + g1 * d(r1, s) for s in range(4)]
        for q in range(4):
            s0, h0, s1, h1 = _BT_TAPS[q]
            v = (h0 * R[s0] + h1 * R[s1]).astype(mm_dtype)
            m = jnp.dot(v, u_ref[4 * p + q],
                        preferred_element_type=jnp.float32)
            for u in range(2):
                au = _AT[u, p]
                if au == 0.0:
                    continue
                for vv in range(2):
                    av = _AT[vv, q]
                    if av == 0.0:
                        continue
                    t = m if au * av == 1.0 else -m
                    y[u][vv] = t if y[u][vv] is None else y[u][vv] + t

    bias = b_ref[0].astype(jnp.float32)
    for u in range(2):
        for vv in range(2):
            o = (y[u][vv] + bias).reshape(nb, th, wh, K)
            out_ref[:, :, u, :, vv * K:(vv + 1) * K] = o.astype(
                out_ref.dtype)


def _wino_gn_kernel(xa_ref, xb_ref, u_ref, b_ref, a_ref, c_ref, cmask_ref,
                    out_ref, *, nb, th, wh, C, K, mm_dtype, H, same):
    """Winograd block with the GroupNorm affine + relu FUSED into the input
    window assembly: computes conv3x3(relu(a*x + c)) without the normalized
    tensor ever visiting HBM (saves a full write+read of it per conv).

    a/c: per-image effective affine, duplicated over the two lane phases
    (nb, 1, 2C). `same`: zero the padded border AFTER the affine (the dense
    conv pads the NORMALIZED tensor, and relu(c) != 0) — rows via the strip
    id, cols via the precomputed (PW, 2C) mask.
    """
    x = jnp.concatenate([xa_ref[...], xb_ref[...]], axis=1)
    aff_a = a_ref[...][:, :, None, None, :]        # (nb,1,1,1,2C)
    aff_c = c_ref[...][:, :, None, None, :]
    xn = jnp.maximum(x.astype(jnp.float32) * aff_a + aff_c, 0.0)
    if same:
        pair = jax.lax.broadcasted_iota(jnp.int32, xn.shape, 1)
        phase = jax.lax.broadcasted_iota(jnp.int32, xn.shape, 2)
        grow = (pl.program_id(1) * th + pair) * 2 + phase
        xn = jnp.where((grow >= 1) & (grow <= H), xn, 0.0)
        xn = xn * cmask_ref[...][None, None, None, :, :]
    _wino_core(xn.astype(mm_dtype), u_ref, b_ref, out_ref, nb=nb, th=th,
               wh=wh, C=C, K=K, mm_dtype=mm_dtype)


def _pick_block(NB, Hh, Wh, target=512):
    """(nb, th): images/tile-rows per kernel instance, sized so the matmul
    M-dim (nb*th*Wh) lands near `target` rows; th always divides Hh (it
    starts at Hh and halves). Kept at ~512 so the double-buffered input/
    output blocks + fp32 accumulators fit comfortably in 16MB VMEM."""
    th = Hh
    while th > 1 and th * Wh > target and th % 2 == 0:
        th //= 2
    nb = 1
    while (NB % (2 * nb) == 0) and 2 * nb * th * Wh <= target:
        nb *= 2
    return nb, th


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def winograd_conv3x3(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                     padding: str = "SAME") -> jnp.ndarray:
    """3x3 conv, NHWC, stride 1, 'SAME' or 'VALID', via Winograd F(2x2,3x3).

    x (NB, H, W, C), w (3, 3, C, K), b (K,). SAME requires even H, W; VALID
    requires even H-2, W-2. C and K must be multiples of 128 (lane-slice
    alignment); callers fall back to lax.conv otherwise.
    """
    return _winograd_fwd_impl(x, w, b, padding)


def _winograd_fwd_impl(x, w, b, padding, interpret=None):
    if interpret is None:
        # pallas_call compiles only on TPU; CPU (tests) runs the interpreter
        interpret = jax.default_backend() != "tpu"
    NB, H, W, C = x.shape
    K = w.shape[-1]
    assert w.shape[:3] == (3, 3, C), w.shape
    assert C % 128 == 0 and K % 128 == 0, (C, K)
    if padding == "SAME":
        assert H % 2 == 0 and W % 2 == 0, (H, W)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        Hh, Wh = H // 2, W // 2
    else:
        assert padding == "VALID" and H % 2 == 0 and W % 2 == 0, (padding, H, W)
        xp = x
        Hh, Wh = (H - 2) // 2, (W - 2) // 2
    H2, W2 = xp.shape[1], xp.shape[2]
    PH, PW = H2 // 2, W2 // 2
    # free view: (NB, H2, W2, C) -> (NB, PH, 2, PW, 2C)
    xv = xp.reshape(NB, PH, 2, PW, 2 * C)

    nb, th = _pick_block(NB, Hh, Wh)
    grid = (NB // nb, Hh // th)
    mm_dtype = x.dtype
    u = transform_kernel(w).astype(mm_dtype)
    bias = b.reshape(1, K).astype(jnp.float32)

    out = pl.pallas_call(
        partial(_wino_kernel, nb=nb, th=th, wh=Wh, C=C, K=K,
                mm_dtype=mm_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb, th, 2, PW, 2 * C),
                         lambda ib, ir: (ib, ir, 0, 0, 0)),
            pl.BlockSpec((nb, 1, 2, PW, 2 * C),
                         lambda ib, ir: (ib, ir * th + th, 0, 0, 0)),
            pl.BlockSpec((16, C, K), lambda ib, ir: (0, 0, 0)),
            pl.BlockSpec((1, K), lambda ib, ir: (0, 0)),
        ],
        out_specs=pl.BlockSpec((nb, th, 2, Wh, 2 * K),
                               lambda ib, ir: (ib, ir, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NB, Hh, 2, Wh, 2 * K), x.dtype),
        interpret=interpret,
    )(xv, xv, u, bias)
    # free view back: (NB, Hh, 2, Wh, 2K) == (NB, H', W', K)
    return out.reshape(NB, 2 * Hh, 2 * Wh, K)


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def winograd_conv3x3_gn_relu(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                             a: jnp.ndarray, c: jnp.ndarray,
                             padding: str = "SAME") -> jnp.ndarray:
    """conv3x3(relu(a * x + c)) with the per-image channel affine (the
    folded GroupNorm) and relu fused into the Winograd window assembly.

    x (NB, H, W, C) RAW (pre-norm); a/c (NB, C) effective affine:
    a = gamma * rsqrt(var + eps) per channel, c = beta - mean * a.
    The normalized tensor never round-trips HBM (one write + one read of
    an (NB, H, W, C) tensor saved per conv vs normalize-then-conv).
    """
    return _winograd_gn_fwd_impl(x, w, b, a, c, padding)


def _winograd_gn_fwd_impl(x, w, b, a, c, padding, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    NB, H, W, C = x.shape
    K = w.shape[-1]
    assert w.shape[:3] == (3, 3, C), w.shape
    assert a.shape == (NB, C) and c.shape == (NB, C), (a.shape, c.shape)
    assert C % 128 == 0 and K % 128 == 0, (C, K)
    same = padding == "SAME"
    if same:
        assert H % 2 == 0 and W % 2 == 0, (H, W)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        Hh, Wh = H // 2, W // 2
    else:
        assert padding == "VALID" and H % 2 == 0 and W % 2 == 0, (padding, H, W)
        xp = x
        Hh, Wh = (H - 2) // 2, (W - 2) // 2
    H2, W2 = xp.shape[1], xp.shape[2]
    PH, PW = H2 // 2, W2 // 2
    xv = xp.reshape(NB, PH, 2, PW, 2 * C)

    nb, th = _pick_block(NB, Hh, Wh)
    grid = (NB // nb, Hh // th)
    mm_dtype = x.dtype
    u = transform_kernel(w).astype(mm_dtype)
    bias = b.reshape(1, K).astype(jnp.float32)
    # lane-phase duplication + a unit middle dim (Mosaic block constraint:
    # last two block dims divisible by (8, 128) OR equal to the array dims)
    a2 = jnp.concatenate([a, a], axis=-1).astype(jnp.float32)[:, None, :]
    c2 = jnp.concatenate([c, c], axis=-1).astype(jnp.float32)[:, None, :]
    # column validity of the padded view: phase-0 col 2p invalid at p=0,
    # phase-1 col 2p+1 invalid at p=PW-1 (only under SAME padding)
    cm = np.ones((PW, 2 * C), np.float32)
    if same:
        cm[0, :C] = 0.0
        cm[PW - 1, C:] = 0.0
    cmask = jnp.asarray(cm)

    out = pl.pallas_call(
        partial(_wino_gn_kernel, nb=nb, th=th, wh=Wh, C=C, K=K,
                mm_dtype=mm_dtype, H=H, same=same),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb, th, 2, PW, 2 * C),
                         lambda ib, ir: (ib, ir, 0, 0, 0)),
            pl.BlockSpec((nb, 1, 2, PW, 2 * C),
                         lambda ib, ir: (ib, ir * th + th, 0, 0, 0)),
            pl.BlockSpec((16, C, K), lambda ib, ir: (0, 0, 0)),
            pl.BlockSpec((1, K), lambda ib, ir: (0, 0)),
            pl.BlockSpec((nb, 1, 2 * C), lambda ib, ir: (ib, 0, 0)),
            pl.BlockSpec((nb, 1, 2 * C), lambda ib, ir: (ib, 0, 0)),
            pl.BlockSpec((PW, 2 * C), lambda ib, ir: (0, 0)),
        ],
        out_specs=pl.BlockSpec((nb, th, 2, Wh, 2 * K),
                               lambda ib, ir: (ib, ir, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NB, Hh, 2, Wh, 2 * K), x.dtype),
        interpret=interpret,
    )(xv, xv, u, bias, a2, c2, cmask)
    return out.reshape(NB, 2 * Hh, 2 * Wh, K)


def conv3x3_gn_relu_xla(x, w, b, a, c, padding="SAME"):
    """Unfused twin: normalize+relu in fp32, then the direct conv (also the
    VJP carrier for the fused kernel)."""
    h = jnp.maximum(x.astype(jnp.float32) * a[:, None, None, :]
                    + c[:, None, None, :], 0.0).astype(x.dtype)
    return conv3x3_xla(h, w, b, padding)


def _wino_gn_fwd(x, w, b, a, c, padding):
    return winograd_conv3x3_gn_relu(x, w, b, a, c, padding), (x, w, b, a, c)


def _wino_gn_bwd(padding, res, g):
    x, w, b, a, c = res
    _, vjp = jax.vjp(
        lambda x_, w_, b_, a_, c_: conv3x3_gn_relu_xla(x_, w_, b_, a_, c_,
                                                       padding),
        x, w, b, a, c)
    return vjp(g)


winograd_conv3x3_gn_relu.defvjp(_wino_gn_fwd, _wino_gn_bwd)


def gn_affine(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
              groups: int, eps: float = 1e-6):
    """Fold GroupNorm statistics of x (NB, H, W, C) into a per-image
    channel affine: returns (a, c) with relu(a*x + c) == relu(GN(x)).
    One fp32 pass (sum + sum-of-squares)."""
    NB, H, W, C = x.shape
    Cg = C // groups
    g = x.astype(jnp.float32).reshape(NB, H * W, groups, Cg)
    m = g.mean(axis=(1, 3))                                    # (NB, groups)
    var = jnp.maximum((g * g).mean(axis=(1, 3)) - m * m, 0.0)
    inv = jax.lax.rsqrt(var + eps)                             # (NB, groups)
    sg = scale.astype(jnp.float32).reshape(groups, Cg)
    bg = bias.astype(jnp.float32).reshape(groups, Cg)
    a = (inv[:, :, None] * sg[None]).reshape(NB, C)
    c = (bg[None] - (m * inv)[:, :, None] * sg[None]).reshape(NB, C)
    return a, c


def conv3x3_xla(x, w, b, padding="SAME"):
    """Direct XLA conv twin (also the VJP carrier)."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (y + b.astype(jnp.float32)).astype(x.dtype)


def _wino_fwd(x, w, b, padding):
    return winograd_conv3x3(x, w, b, padding), (x, w, b)


def _wino_bwd(padding, res, g):
    x, w, b = res
    _, vjp = jax.vjp(lambda x_, w_, b_: conv3x3_xla(x_, w_, b_, padding),
                     x, w, b)
    return vjp(g)


winograd_conv3x3.defvjp(_wino_fwd, _wino_bwd)


def supports_winograd(x_shape, C, K, padding):
    NB, H, W = x_shape[0], x_shape[1], x_shape[2]
    if C % 128 or K % 128:
        return False
    return H % 2 == 0 and W % 2 == 0 and H >= 4 and W >= 4
