"""Pallas TPU kernel for per-tile Gaussian compositing.

The fast path of the splat renderer (ops/splat.py): projection + tile binning
stay in XLA (they're matmuls/sorts/top_k — already optimal there); the
per-tile front-to-back alpha blend runs as a Pallas kernel with the whole
tile working set in VMEM:

  grid = (num_tiles,)
  per-tile inputs: 9 planes of (K,) packed Gaussian params (mean2d, conic,
  opacity, rgb), depth-ordered, opacity pre-masked to 0 for padding slots.
  per-tile compute: alpha (P=256 pixels, K) on the VPU, transmittance via a
  cumulative sum of log(1-alpha) along K, blend via lane reductions.

Replaces the sequential warp-per-pixel loop of the CUDA rasterizer
(reference: src/models/renderer.py:516-566 calls into
diff-gaussian-rasterization) with a data-parallel prefix formulation:
w_i = alpha_i * exp(cumsum_{j<i} log(1-alpha_j)).

Differentiation: `composite_tiles` carries a custom VJP whose backward is a
SECOND Pallas kernel (`_tile_bwd_kernel`) that recomputes the tile blend
in VMEM and emits d(tile_params) directly — the TPU analog of the CUDA
rasterizer's fused backward (reference renderer.py:555-566 autograd path).
Only the (small) packed tile inputs are saved as residuals; the suffix-sum
over later gaussians (the back-to-front accumulation of the CUDA bwd) is a
strictly-lower-triangular (P,K)@(K,K) MXU matmul. An XLA twin of the
backward (`jax.vjp` of `_composite_tiles_xla`) remains as the numerical
oracle for tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import splat
from .splat import ALPHA_MAX, ALPHA_MIN, T_EPS, TILE

P = TILE * TILE  # pixels per tile


def _tile_kernel(tx_ref, mx, my, cxx, cxy, cyy, op, cr, cg, cb, out_ref):
    """One 16x16 tile: composite K depth-ordered gaussians over 256 pixels.

    mx..cb are (1, K) row values already loaded from VMEM.
    """
    tx = tx_ref[0]   # tiles per row (scalar prefetch)
    ntpf = tx_ref[1]  # tiles per frame: multi-frame grids stack frames
    tid = pl.program_id(0) % ntpf
    txi = (tid % tx).astype(jnp.float32)
    tyi = (tid // tx).astype(jnp.float32)

    pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (pix % TILE).astype(jnp.float32) + txi * TILE  # (P, 1)
    py = (pix // TILE).astype(jnp.float32) + tyi * TILE

    dx = px - mx     # (P, K)
    dy = py - my
    power = -0.5 * (cxx * dx * dx + cyy * dy * dy) - cxy * dx * dy
    alpha = jnp.minimum(op * jnp.exp(jnp.minimum(power, 0.0)), ALPHA_MAX)
    alpha = jnp.where((power > 0.0) | (alpha < ALPHA_MIN), 0.0, alpha)

    log1m = jnp.log1p(-alpha)                       # (P, K)
    # Inclusive prefix-sum along K. Mosaic has no cumsum lowering; express it
    # as a triangular matmul — one (P,K)@(K,K) f32 MXU op per tile.
    K = log1m.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    tri = (rows <= cols).astype(jnp.float32)        # upper-tri incl diag
    logT_after = jnp.dot(log1m, tri, preferred_element_type=jnp.float32)
    logT_before = logT_after - log1m
    w = alpha * jnp.exp(logT_before)
    w = jnp.where(jnp.exp(logT_after) < T_EPS, 0.0, w)

    T_final = jnp.exp(logT_after[:, -1:])           # (P, 1)
    # white background (reference renderer.py:512-514)
    r = jnp.sum(w * cr, axis=1, keepdims=True) + T_final
    g = jnp.sum(w * cg, axis=1, keepdims=True) + T_final
    b = jnp.sum(w * cb, axis=1, keepdims=True) + T_final

    out = jnp.concatenate([r, g, b], axis=1)        # (P, 3)
    out_ref[0] = jnp.clip(out, 0.0, 1.0)


def _composite_tiles_pallas(tile_params: jnp.ndarray, tx: int,
                            tiles_per_frame: int = 0) -> jnp.ndarray:
    """tile_params: (T, 9, K) packed [mx,my,cxx,cxy,cyy,op,r,g,b] -> (T, P, 3).

    tiles_per_frame > 0: T is F stacked frames of that many tiles (same
    resolution); tile origins repeat per frame. One grid — one kernel
    launch for the whole frame batch."""
    n_tiles, _, K = tile_params.shape
    ntpf = tiles_per_frame or n_tiles

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 9, K), lambda t, s: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, P, 3), lambda t, s: (t, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    def kernel(s_ref, data_ref, out_ref):
        rows = [data_ref[0, i:i + 1, :] for i in range(9)]  # each (1, K)
        _tile_kernel(s_ref, *rows, out_ref)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, P, 3), jnp.float32),
    )(jnp.asarray([tx, ntpf], jnp.int32), tile_params)


def _composite_tiles_xla(tile_params: jnp.ndarray, tile_origin: jnp.ndarray) -> jnp.ndarray:
    """Reference/backward path: identical math in plain JAX.

    tile_params: (T, 9, K); tile_origin: (T, 2) pixel origin -> (T, P, 3).
    """
    pix = jnp.arange(P)
    ox = (pix % TILE).astype(jnp.float32)
    oy = (pix // TILE).astype(jnp.float32)

    def one(params, origin):
        mx, my, cxx, cxy, cyy, op, cr, cg, cb = params  # each (K,)
        px = (ox + origin[0])[:, None]
        py = (oy + origin[1])[:, None]
        dx = px - mx[None, :]
        dy = py - my[None, :]
        power = -0.5 * (cxx[None] * dx * dx + cyy[None] * dy * dy) - cxy[None] * dx * dy
        alpha = jnp.minimum(op[None] * jnp.exp(jnp.minimum(power, 0.0)), ALPHA_MAX)
        alpha = jnp.where((power > 0.0) | (alpha < ALPHA_MIN), 0.0, alpha)
        log1m = jnp.log1p(-alpha)
        logT_after = jnp.cumsum(log1m, axis=1)
        logT_before = logT_after - log1m
        w = alpha * jnp.exp(logT_before)
        w = jnp.where(jnp.exp(logT_after) < T_EPS, 0.0, w)
        T_final = jnp.exp(logT_after[:, -1:])
        colors = jnp.stack([cr, cg, cb], axis=-1)  # (K, 3)
        img = w @ colors + T_final  # white bg
        return jnp.clip(img, 0.0, 1.0)

    return jax.vmap(one)(tile_params, tile_origin)


def _tile_bwd_kernel(tx_ref, data_ref, g_ref, out_ref):
    """Backward of one tile: d(out (P,3)) -> d(packed params (9, K)).

    Recomputes the forward blend from the packed params (no O(P*K)
    residuals), then:
      dL/dalpha_k = G_k * T_before_k * [not cut]
                    - (sum_{j>k} G_j w_j + gT * T_final) / (1 - alpha_k)
    with G = g_clip @ colors^T and gT = sum_c g_clip (white bg). The suffix
    sum is a strictly-lower-triangular matmul on the MXU.
    """
    tx = tx_ref[0]
    ntpf = tx_ref[1]
    tid = pl.program_id(0) % ntpf
    txi = (tid % tx).astype(jnp.float32)
    tyi = (tid // tx).astype(jnp.float32)

    mx, my, cxx, cxy, cyy, op, cr, cg, cb = [
        data_ref[0, i:i + 1, :] for i in range(9)]  # each (1, K)
    g = g_ref[0]  # (P, 3)

    pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (pix % TILE).astype(jnp.float32) + txi * TILE
    py = (pix // TILE).astype(jnp.float32) + tyi * TILE

    # ---- forward recompute ----
    dx = px - mx                                    # (P, K)
    dy = py - my
    power = -0.5 * (cxx * dx * dx + cyy * dy * dy) - cxy * dx * dy
    e = jnp.exp(jnp.minimum(power, 0.0))
    araw = op * e
    alpha_c = jnp.minimum(araw, ALPHA_MAX)
    keep = jnp.logical_not((power > 0.0) | (alpha_c < ALPHA_MIN))
    alpha = jnp.where(keep, alpha_c, 0.0)

    log1m = jnp.log1p(-alpha)
    K = log1m.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    tri_incl = (rows <= cols).astype(jnp.float32)
    logT_after = jnp.dot(log1m, tri_incl, preferred_element_type=jnp.float32)
    T_after = jnp.exp(logT_after)
    Tb = jnp.exp(logT_after - log1m)                # T before each gaussian
    notcut = T_after >= T_EPS
    w = jnp.where(notcut, alpha * Tb, 0.0)
    T_final = T_after[:, -1:]                       # (P, 1)

    # ---- clip mask on the pre-clip output ----
    r_pre = jnp.sum(w * cr, axis=1, keepdims=True) + T_final
    g_pre = jnp.sum(w * cg, axis=1, keepdims=True) + T_final
    b_pre = jnp.sum(w * cb, axis=1, keepdims=True) + T_final
    gr = g[:, 0:1] * ((r_pre > 0.0) & (r_pre < 1.0))
    gg = g[:, 1:2] * ((g_pre > 0.0) & (g_pre < 1.0))
    gb = g[:, 2:3] * ((b_pre > 0.0) & (b_pre < 1.0))

    # ---- blend backward ----
    G = gr * cr + gg * cg + gb * cb                 # (P, K)
    gT = gr + gg + gb                               # (P, 1)
    Xw = G * w
    tri_strict = (rows > cols).astype(jnp.float32)  # [k, j] = 1 iff k > j
    S = jnp.dot(Xw, tri_strict, preferred_element_type=jnp.float32)
    dalpha = (jnp.where(notcut, G * Tb, 0.0)
              - (S + gT * T_final) / (1.0 - alpha))
    dalpha = jnp.where(keep, dalpha, 0.0)

    # ---- activation backward ----
    dar = jnp.where(araw < ALPHA_MAX, dalpha, 0.0)
    dpow = dar * araw * (power < 0.0)
    dop = jnp.sum(dar * e, axis=0, keepdims=True)          # (1, K)
    dmx = jnp.sum(dpow * (cxx * dx + cxy * dy), axis=0, keepdims=True)
    dmy = jnp.sum(dpow * (cyy * dy + cxy * dx), axis=0, keepdims=True)
    dcxx = jnp.sum(dpow * (-0.5 * dx * dx), axis=0, keepdims=True)
    dcxy = jnp.sum(dpow * (-dx * dy), axis=0, keepdims=True)
    dcyy = jnp.sum(dpow * (-0.5 * dy * dy), axis=0, keepdims=True)
    dcr = jnp.sum(gr * w, axis=0, keepdims=True)
    dcg = jnp.sum(gg * w, axis=0, keepdims=True)
    dcb = jnp.sum(gb * w, axis=0, keepdims=True)

    out_ref[0] = jnp.concatenate(
        [dmx, dmy, dcxx, dcxy, dcyy, dop, dcr, dcg, dcb], axis=0)  # (9, K)


def _composite_tiles_bwd_pallas(tile_params: jnp.ndarray, g: jnp.ndarray,
                                tx: int,
                                tiles_per_frame: int = 0) -> jnp.ndarray:
    """tile_params (T, 9, K), g (T, P, 3) -> d tile_params (T, 9, K)."""
    n_tiles, _, K = tile_params.shape
    ntpf = tiles_per_frame or n_tiles

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 9, K), lambda t, s: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 3), lambda t, s: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 9, K), lambda t, s: (t, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _tile_bwd_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 9, K), jnp.float32),
    )(jnp.asarray([tx, ntpf], jnp.int32), tile_params, g)


def _composite_tiles_bwd_xla(tile_params: jnp.ndarray, tile_origin: jnp.ndarray,
                             g: jnp.ndarray) -> jnp.ndarray:
    """Numerical oracle: autodiff through the XLA twin."""
    _, vjp = jax.vjp(lambda p: _composite_tiles_xla(p, tile_origin), tile_params)
    (dp,) = vjp(g)
    return dp


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def composite_tiles(tile_params: jnp.ndarray, tile_origin: jnp.ndarray,
                    tx: int, tiles_per_frame: int = 0) -> jnp.ndarray:
    return _composite_tiles_pallas(tile_params, tx, tiles_per_frame)


def _ct_fwd(tile_params, tile_origin, tx, tiles_per_frame):
    return (_composite_tiles_pallas(tile_params, tx, tiles_per_frame),
            (tile_params, tile_origin))


def _ct_bwd(tx, tiles_per_frame, res, g):
    tile_params, tile_origin = res
    dp = _composite_tiles_bwd_pallas(tile_params, g, tx, tiles_per_frame)
    return dp, jnp.zeros_like(tile_origin)


composite_tiles.defvjp(_ct_fwd, _ct_bwd)


def _pack_sorted_params(proj: splat.Projected, width: int, height: int,
                        max_per_tile: int, max_window: int,
                        large_cap: int = 0, small_window: int = 2):
    """Sort-carrying-values binning for the segment-DMA composite.

    ONE stable variadic sort on the (tile, depth) key PAIR with the 9
    packed gaussian params carried as sort VALUES (lax.sort num_keys=2) —
    no depth pre-argsort, no order gathers, no (T, K) index gather, no
    (T, 9, K) take. Measured on v5e (tools/gather_probe.py): flat s32
    gathers lower to <1 GB/s and cost ~14 ms/frame at serving scale; the
    value-carrying sort costs ~4 ms. Within a tile the stable two-key sort
    yields depth-ascending order; float-equal-depth ties break by candidate
    emission order (vs gaussian index in the earlier depth-argsort form —
    indistinguishable except on exactly-equal f32 depths).

    large_cap > 0 enables TWO-TIER binning: every gaussian emits a
    small_window^2 candidate block, and the `large_cap` largest-radius
    gaussians spanning more than small_window tiles emit a full
    max_window^2 block instead. The sorted candidate list shrinks ~3x
    (30k*16 -> 30k*4 + 2k*16) while staying EXACT vs the single-tier
    max_window binning whenever at most `large_cap` gaussians span more
    than small_window tiles; overflow beyond the cap degrades those
    gaussians to small_window clipping (the CUDA reference's unbounded
    per-gaussian tile ranges, renderer.py:516-566, have no static-shape
    equivalent — the cap is the TPU answer).

    Returns (params_sorted (16, NP + K) f32 — 9 param rows padded to the
    sublane tile and a K-column guard so a K-slice starting at any segment
    start stays in bounds, starts (T,) s32, counts (T,) s32 clamped to K).
    """
    tx = width // TILE
    ty = height // TILE
    n_tiles = tx * ty
    n = proj.mean2d.shape[0]
    K = min(max_per_tile, n)

    mean2d = proj.mean2d
    conic = proj.conic
    color = proj.color
    radius = jnp.where(proj.valid, proj.radius, 0.0)
    opac = jnp.where(proj.valid, proj.opacity, 0.0)
    # depth is the SECOND sort key; dead candidates go to the sentinel tile
    # whatever their depth, but zero it anyway so no NaN enters the sort.
    depth = jnp.where(proj.valid, proj.depth, 0.0)

    x0r = jnp.floor((mean2d[:, 0] - radius) / TILE)
    x1r = jnp.floor((mean2d[:, 0] + radius) / TILE)
    y0r = jnp.floor((mean2d[:, 1] - radius) / TILE)
    y1r = jnp.floor((mean2d[:, 1] + radius) / TILE)
    alive = (radius > 0) & (x1r >= 0) & (x0r <= tx - 1) & (y1r >= 0) & \
        (y0r <= ty - 1)
    x0 = jnp.clip(x0r, 0, tx - 1).astype(jnp.int32)
    x1 = jnp.clip(x1r, 0, tx - 1).astype(jnp.int32)
    y0 = jnp.clip(y0r, 0, ty - 1).astype(jnp.int32)
    y1 = jnp.clip(y1r, 0, ty - 1).astype(jnp.int32)

    def emit(x0e, y0e, x1e, y1e, alive_e, W):
        off = jnp.arange(W, dtype=jnp.int32)
        gx = x0e[:, None] + off[None, :]
        gy = y0e[:, None] + off[None, :]
        vx = (gx <= x1e[:, None]) & (gx < tx)
        vy = (gy <= y1e[:, None]) & (gy < ty)
        tile_id = gy[:, :, None] * tx + gx[:, None, :]      # (m, W, W)
        valid = vy[:, :, None] & vx[:, None, :] & alive_e[:, None, None]
        return jnp.where(valid, tile_id, jnp.int32(n_tiles)).reshape(-1)

    def rep(v, W):
        return jnp.broadcast_to(
            v[:, None], (v.shape[0], W * W)).reshape(-1)

    cols = (depth,
            mean2d[:, 0], mean2d[:, 1],
            conic[:, 0], conic[:, 1], conic[:, 2], opac,
            color[:, 0], color[:, 1], color[:, 2])

    two_tier = large_cap > 0 and max_window > small_window and \
        large_cap < n
    if not two_tier:
        W = max_window
        key = emit(x0, y0, x1, y1, alive, W)
        payload = [rep(v, W) for v in cols]
    else:
        WS, WL = small_window, max_window
        KL = large_cap
        span_big = ((x1 - x0) >= WS) | ((y1 - y0) >= WS)
        score = jnp.where(span_big & alive, radius, -1.0)
        _, bidx = jax.lax.top_k(score, KL)                  # unique indices
        sel = score[bidx] > 0
        is_b = jnp.zeros((n,), bool).at[bidx].set(sel)
        key_a = emit(x0, y0, x1, y1, alive & ~is_b, WS)
        key_b = emit(x0[bidx], y0[bidx], x1[bidx], y1[bidx], sel, WL)
        key = jnp.concatenate([key_a, key_b])
        payload = [jnp.concatenate([rep(v, WS), rep(v[bidx], WL)])
                   for v in cols]

    NP = key.shape[0]
    sorted_all = jax.lax.sort((key,) + tuple(payload), num_keys=2,
                              is_stable=True)
    keys_sorted = sorted_all[0]
    params_sorted = jnp.stack(sorted_all[2:], axis=0)       # (9, NP)
    # pad rows 9 -> 16 (Mosaic DMA slices must align to the (8,128) sublane
    # tiling) and columns by the kernel's DMA window (a 128-aligned,
    # 128-chunk-multiple window covering off+K; counts/offsets mask the
    # out-of-segment slots)
    win = (K + 2 * 128 - 1) // 128 * 128
    params_sorted = jnp.pad(params_sorted, ((0, 16 - 9), (0, win)))

    # ONE searchsorted over tids 0..T: ends(t) == starts(t+1) on an
    # ascending key array (side='right' at t == side='left' at t+1)
    tids = jnp.arange(n_tiles + 1, dtype=jnp.int32)
    bounds = jnp.searchsorted(keys_sorted, tids,
                              side="left").astype(jnp.int32)
    starts, ends = bounds[:-1], bounds[1:]
    counts = jnp.minimum(ends - starts, K).astype(jnp.int32)
    starts = jnp.minimum(starts, NP)
    return params_sorted, starts, counts


def _seg_kernel(starts_ref, counts_ref, tx_ref, params_hbm, out_ref,
                scratch, sem):
    """Segment-DMA tile composite: program t DMAs its contiguous sorted
    K-segment [(9, starts[t]:starts[t]+K)] from HBM and blends it.

    The segment layout IS the CUDA rasterizer's design (sorted key ranges
    per tile, renderer.py:516-566) — here the range read is one strided 2D
    DMA instead of a warp loop. HBM slice starts must be 128-lane-aligned,
    so the DMA fetches the aligned K+128 window containing the segment and
    the in-window offset masks the out-of-segment slots (alpha=0 slots are
    exact no-ops in the blend)."""
    t = pl.program_id(0)
    tx = tx_ref[0]
    ntpf = tx_ref[1]
    start = starts_ref[t]
    count = counts_ref[t]
    start_al = (start // 128) * 128
    off = start - start_al

    cp = pltpu.make_async_copy(
        params_hbm.at[:, pl.ds(start_al, scratch.shape[1])], scratch, sem)
    cp.start()
    cp.wait()

    tid = t % ntpf
    txi = (tid % tx).astype(jnp.float32)
    tyi = (tid // tx).astype(jnp.float32)
    pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (pix % TILE).astype(jnp.float32) + txi * TILE
    py = (pix // TILE).astype(jnp.float32) + tyi * TILE

    # Chunked front-to-back blend: compute scales with the tile's ACTUAL
    # segment length (average ~a fifth of K at serving load), not the
    # static window — the (P, K)@(K, K) triangular-cumsum matmul of the
    # one-shot form is >90% of this kernel's FLOPs and is paid in full
    # even for empty tiles. Per 128-slot chunk: in-chunk triangular
    # cumsum + a carried per-pixel log-transmittance.
    CH = 128
    rows = jax.lax.broadcasted_iota(jnp.int32, (CH, CH), 0)
    cols_t = jax.lax.broadcasted_iota(jnp.int32, (CH, CH), 1)
    tri = (rows <= cols_t).astype(jnp.float32)
    ccol = jax.lax.broadcasted_iota(jnp.int32, (1, CH), 1)
    n_ch = jnp.where(count > 0, (off + count + CH - 1) // CH, 0)

    def chunk(c, state):
        logT0, acc_r, acc_g, acc_b = state
        base = c * CH
        sl = scratch[:, pl.ds(base, CH)]                     # (16, CH)
        slot_ok = (base + ccol >= off) & (base + ccol < off + count)
        mx = sl[0:1]
        my = sl[1:2]
        cxx = sl[2:3]
        cxy = sl[3:4]
        cyy = sl[4:5]
        op = jnp.where(slot_ok, sl[5:6], 0.0)
        dx = px - mx
        dy = py - my
        power = -0.5 * (cxx * dx * dx + cyy * dy * dy) - cxy * dx * dy
        alpha = jnp.minimum(op * jnp.exp(jnp.minimum(power, 0.0)), ALPHA_MAX)
        alpha = jnp.where((power > 0.0) | (alpha < ALPHA_MIN), 0.0, alpha)
        log1m = jnp.log1p(-alpha)                            # (P, CH)
        cums = jnp.dot(log1m, tri, preferred_element_type=jnp.float32)
        logT_after = logT0 + cums
        w = alpha * jnp.exp(logT_after - log1m)
        w = jnp.where(jnp.exp(logT_after) < T_EPS, 0.0, w)
        return (logT0 + cums[:, -1:],
                acc_r + jnp.sum(w * sl[6:7], axis=1, keepdims=True),
                acc_g + jnp.sum(w * sl[7:8], axis=1, keepdims=True),
                acc_b + jnp.sum(w * sl[8:9], axis=1, keepdims=True))

    zero = jnp.zeros((P, 1), jnp.float32)
    logT, r, g, b = jax.lax.fori_loop(0, n_ch, chunk,
                                      (zero, zero, zero, zero))
    T_final = jnp.exp(logT)
    out = jnp.concatenate([r + T_final, g + T_final, b + T_final], axis=1)
    out_ref[0] = jnp.clip(out, 0.0, 1.0)


def _composite_segments_pallas(params_sorted: jnp.ndarray,
                               starts: jnp.ndarray, counts: jnp.ndarray,
                               K: int, tx: int,
                               tiles_per_frame: int = 0) -> jnp.ndarray:
    """params_sorted (16, NP+K), starts/counts (T,) -> (T, P, 3).

    FORWARD-ONLY (serving): contains a manual-DMA pallas_call with no VJP —
    training uses composite_tiles (gather packing + custom VJP)."""
    n_tiles = starts.shape[0]
    ntpf = tiles_per_frame or n_tiles

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, P, 3), lambda t, s0, s1, s2: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((16, (K + 2 * 128 - 1) // 128 * 128),
                                   jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        _seg_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, P, 3), jnp.float32),
    )(starts, counts, jnp.asarray([tx, ntpf], jnp.int32), params_sorted)


def render_frames_segmented(xyz: jnp.ndarray, rot: jnp.ndarray,
                            raw_scales: jnp.ndarray, raw_opacity: jnp.ndarray,
                            colors: jnp.ndarray, K: jnp.ndarray,
                            E: jnp.ndarray, width: int, height: int,
                            max_per_tile: int = 512, max_window: int = 8,
                            sh_degree=None, large_cap: int = 0) -> jnp.ndarray:
    """Serving fast path: F frames, value-carrying sort binning + ONE
    segment-DMA composite grid. Identical output to render_frames_pallas;
    forward-only (no VJP — the training path keeps composite_tiles).
    large_cap > 0 enables two-tier binning (see _pack_sorted_params)."""
    from .splat import (activate_scales, activate_opacity, make_camera,
                        project_gaussians, sh_colors)
    assert width % TILE == 0 and height % TILE == 0
    tx = width // TILE
    ty = height // TILE
    n_tiles = tx * ty
    F = xyz.shape[0]
    N = xyz.shape[1]
    Kcap = min(max_per_tile, N)

    params_l, starts_l, counts_l = [], [], []
    for f in range(F):
        cam = make_camera(K[f], E[f], width, height)
        if sh_degree is not None:
            rgb = sh_colors(colors[f], xyz[f], cam.center, sh_degree)
        else:
            rgb = jnp.clip(colors[f], 0.0, 1.0)
        o = raw_opacity[f]
        o1 = o.squeeze(-1) if o.ndim == 2 else o
        proj = project_gaussians(xyz[f], rot[f], activate_scales(raw_scales[f]),
                                 activate_opacity(o1), rgb, cam)
        p, s, c = _pack_sorted_params(proj, width, height, Kcap, max_window,
                                      large_cap=large_cap)
        params_l.append(p)
        starts_l.append(s + f * p.shape[1])
        counts_l.append(c)
    params = jnp.concatenate(params_l, axis=1)     # (9, F*(NP+K))
    starts = jnp.concatenate(starts_l)
    counts = jnp.concatenate(counts_l)
    tiles = _composite_segments_pallas(params, starts, counts, Kcap, tx,
                                       tiles_per_frame=n_tiles)
    tiles = tiles.reshape(F, n_tiles, P, 3)
    return jnp.stack([_tiles_to_image(tiles[f], tx, ty, width, height)
                      for f in range(F)])


def _pack_tile_params(proj: splat.Projected, width: int, height: int,
                      max_per_tile: int, max_window: int,
                      binner: str = "sorted") -> jnp.ndarray:
    """Binning + per-tile param packing: Projected -> (T, 9, K).

    Pure jnp (vmappable) — the expensive part is the pair sort inside the
    binner, which batches efficiently across frames."""
    if binner == "sorted":
        order, tile_idx, tile_mask = splat.bin_gaussians_sorted(
            proj, width, height, max_per_tile, max_window=max_window)
    else:
        order, tile_idx, tile_mask = splat.bin_gaussians(proj, width, height,
                                                         max_per_tile)
    mean2d = proj.mean2d[order]
    conic = proj.conic[order]
    color = proj.color[order]
    opac = jnp.where(proj.valid[order], proj.opacity[order], 0.0)

    # Gather per-tile packed params: (T, 9, K)
    packed = jnp.stack(
        [mean2d[:, 0], mean2d[:, 1], conic[:, 0], conic[:, 1], conic[:, 2],
         opac, color[:, 0], color[:, 1], color[:, 2]],
        axis=0,
    )  # (9, N)
    tile_params = jnp.take(packed, tile_idx, axis=1)         # (9, T, K)
    tile_params = jnp.swapaxes(tile_params, 0, 1)            # (T, 9, K)
    # zero opacity for padding slots
    return tile_params.at[:, 5, :].multiply(tile_mask.astype(tile_params.dtype))


def _tile_origins(tx: int, ty: int) -> jnp.ndarray:
    tids = jnp.arange(tx * ty)
    return jnp.stack(
        [(tids % tx * TILE).astype(jnp.float32), (tids // tx * TILE).astype(jnp.float32)],
        axis=-1,
    )


def _tiles_to_image(tiles: jnp.ndarray, tx: int, ty: int,
                    width: int, height: int) -> jnp.ndarray:
    img = tiles.reshape(ty, tx, TILE, TILE, 3).transpose(0, 2, 1, 3, 4)
    return img.reshape(height, width, 3)


def render_tiles_pallas(proj: splat.Projected, width: int, height: int,
                        max_per_tile: int = 512, interpret: bool = False,
                        binner: str = "sorted", max_window: int = 8) -> jnp.ndarray:
    """Full tile renderer with the Pallas compositing kernel.

    Semantics identical to splat.render_tiles with bg=(1,1,1).
    """
    assert width % TILE == 0 and height % TILE == 0
    tx = width // TILE
    ty = height // TILE
    tile_params = _pack_tile_params(proj, width, height, max_per_tile,
                                    max_window, binner)
    if interpret:
        tiles = _composite_tiles_xla(tile_params, _tile_origins(tx, ty))
    else:
        tiles = composite_tiles(tile_params, _tile_origins(tx, ty), tx)
    return _tiles_to_image(tiles, tx, ty, width, height)


def render_frames_pallas(xyz: jnp.ndarray, rot: jnp.ndarray,
                         raw_scales: jnp.ndarray, raw_opacity: jnp.ndarray,
                         colors: jnp.ndarray, K: jnp.ndarray, E: jnp.ndarray,
                         width: int, height: int, max_per_tile: int = 512,
                         max_window: int = 8, sh_degree=None,
                         interpret: bool = False,
                         batched_binning: bool = True) -> jnp.ndarray:
    """Batched multi-frame fast path: (F, N, ...) gaussians + (F, ...) cams
    -> (F, H, W, 3).

    Same semantics as F calls to splat.render_one(mode='pallas'), but the
    Pallas composite runs as ONE grid over all F frames' tiles (tile
    origins repeat every tx*ty programs) — one kernel launch instead of F.

    batched_binning=True additionally vmaps projection + binning across
    frames, turning the binner's ~N*W^2-key pair sort into a single batched
    sort. Measured SLOWER at full serving scale (XLA lowers the batched
    (F, N*W^2) sort worse than F independent sorts — +47 ms/rollout);
    batched_binning=False keeps F independent sorts, which XLA schedules
    concurrently, and only fuses the composite grid.
    """
    from .splat import (activate_scales, activate_opacity, make_camera,
                        project_gaussians, sh_colors)
    assert width % TILE == 0 and height % TILE == 0
    tx = width // TILE
    ty = height // TILE
    n_tiles = tx * ty

    def prep(x, r, s, o, c, k, e):
        cam = make_camera(k, e, width, height)
        if sh_degree is not None:
            rgb = sh_colors(c, x, cam.center, sh_degree)
        else:
            rgb = jnp.clip(c, 0.0, 1.0)
        o1 = o.squeeze(-1) if o.ndim == 2 else o
        proj = project_gaussians(x, r, activate_scales(s),
                                 activate_opacity(o1), rgb, cam)
        return _pack_tile_params(proj, width, height, max_per_tile,
                                 max_window)

    F = xyz.shape[0]
    if batched_binning:
        tile_params = jax.vmap(prep)(xyz, rot, raw_scales, raw_opacity,
                                     colors, K, E)  # (F, T, 9, K)
    else:
        tile_params = jnp.stack([
            prep(xyz[f], rot[f], raw_scales[f], raw_opacity[f], colors[f],
                 K[f], E[f]) for f in range(F)])
    origins = _tile_origins(tx, ty)
    if interpret:
        imgs = []
        for f in range(F):
            tiles = _composite_tiles_xla(tile_params[f], origins)
            imgs.append(_tiles_to_image(tiles, tx, ty, width, height))
        return jnp.stack(imgs)
    Kp = tile_params.shape[-1]
    tiles = composite_tiles(tile_params.reshape(F * n_tiles, 9, Kp),
                            origins, tx, n_tiles)      # (F*T, P, 3)
    tiles = tiles.reshape(F, n_tiles, P, 3)
    return jnp.stack([_tiles_to_image(tiles[f], tx, ty, width, height)
                      for f in range(F)])
