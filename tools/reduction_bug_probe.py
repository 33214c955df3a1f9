"""Bisect the axon misreduction: which jit programs compute L1 wrong?

grad_render_probe @128 full dims found: pure jit reports l1=0.13846 while
BOTH the in-grad jit AND a host-side numpy recompute of mean|img - gt| on
the SAME returned image bytes give 0.10061. The pure program's reduction
disagrees with its own returned image. Prime suspect: the GT closure array
was produced by an EAGER device transpose — if a program consumes the
argument with a mismatched physical layout, every metric against it is
deterministically wrong while image-only reductions (coverage) stay right.

This tool reproduces with the TINY avatar config (fast compiles) on the
current backend and prints, for pure and in-grad programs:
  l1_eager  : L1 vs GT that was eagerly transposed ON DEVICE
  l1_host   : L1 vs the same GT uploaded from a host numpy transpose
  l1_ingraph: L1 vs GT transposed INSIDE the jit from the raw video
against the host-numpy truth for each.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audio_motion_avatar_tpu.utils.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import numpy as np


def main():
    import argparse
    import dataclasses

    import jax
    import jax.numpy as jnp

    from audio_motion_avatar_tpu.data.synthetic import make_batch
    from audio_motion_avatar_tpu.models.avatar import TriplaneGaussianAvatar
    from audio_motion_avatar_tpu.models.config import AvatarConfig
    from audio_motion_avatar_tpu.models.renderer import build_renderer_statics
    from audio_motion_avatar_tpu.ops import smplx as smplx_ops
    from audio_motion_avatar_tpu.parallel import mesh as pmesh

    ap = argparse.ArgumentParser()
    ap.add_argument("--image-size", type=int, default=64)
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()

    print(f"[red-probe] backend={jax.default_backend()} "
          f"size={args.image_size} dtype={args.dtype}", flush=True)
    sz = (args.image_size, args.image_size)
    cfg = dataclasses.replace(AvatarConfig.tiny(image_size=sz),
                              compute_dtype=args.dtype)
    smplx_model = smplx_ops.synthetic_model(seed=0, num_verts=300)
    statics = build_renderer_statics(smplx_model, subdivide_steps=0)
    nv_enc = 300 + int(np.asarray(smplx_model.faces).shape[0])
    model = TriplaneGaussianAvatar(cfg=cfg, num_verts_encoder=nv_enc)

    ref = jax.tree_util.tree_map(jnp.asarray, make_batch(1, 1, sz, seed=1))
    variables = model.init(jax.random.PRNGKey(0), statics, ref.video,
                           ref.smpl_parms, ref.cam_parms)
    params = pmesh.unbox(variables)["params"]

    # three GT variants with identical logical content
    gt_eager = jnp.transpose(ref.video, (0, 1, 3, 4, 2))          # device op
    gt_np = np.transpose(np.asarray(ref.video), (0, 1, 3, 4, 2))  # host bytes
    gt_host = jnp.asarray(gt_np)                                  # clean upload
    video = ref.video

    def fwd(params):
        out = model.apply({"params": params}, statics, video,
                          ref.smpl_parms, ref.cam_parms)
        r32 = out.rendered_images.astype(jnp.float32)
        gt_ig = jnp.transpose(video, (0, 1, 3, 4, 2))
        return {
            "l1_eager": jnp.mean(jnp.abs(r32 - gt_eager)),
            "l1_host": jnp.mean(jnp.abs(r32 - gt_host)),
            "l1_ingraph": jnp.mean(jnp.abs(r32 - gt_ig)),
            "cov": jnp.mean((jnp.min(r32, axis=-1) < 0.98)),
        }, r32

    def report(tag, m, img):
        img = np.asarray(img, np.float32)
        true_l1 = float(np.mean(np.abs(img - gt_np)))
        row = " ".join(f"{k}={float(v):.6f}" for k, v in m.items())
        print(f"[red-probe] {tag:8s} {row} | HOST true_l1={true_l1:.6f}",
              flush=True)
        return {k: abs(float(v) - true_l1) for k, v in m.items()
                if k.startswith("l1")}

    m_p, img_p = jax.jit(fwd)(params)
    d_pure = report("pure", m_p, img_p)

    def loss(params):
        m, img = fwd(params)
        return m["l1_eager"] + m["l1_host"] + m["l1_ingraph"], (m, img)

    (_, (m_g, img_g)), _ = jax.jit(
        lambda p: jax.value_and_grad(loss, has_aux=True)(p))(params)
    d_grad = report("in-grad", m_g, img_g)

    d_img = float(np.max(np.abs(np.asarray(img_p) - np.asarray(img_g))))
    print(f"[red-probe] max|img_pure - img_grad| = {d_img:.6f}")
    bad = {f"pure.{k}": v for k, v in d_pure.items() if v > 1e-4}
    bad.update({f"grad.{k}": v for k, v in d_grad.items() if v > 1e-4})
    if bad:
        print(f"[red-probe] MISREDUCTIONS: {bad}")
    else:
        print("[red-probe] all reductions agree with host")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
