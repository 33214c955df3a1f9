"""Fused multi-chunk serving rollout == sequential chunk dispatches.

serve_bench's `fuse_chunks` runs N consecutive demo chunks inside one
jitted program, threading the sliding last-T_in token window in-graph
(reference demo slide: src/main2.py:202-203). That must be EXACTLY the
same computation as dispatching the chunks one at a time with the host
doing the slide (main2 demo loop) — this test pins that equivalence at
tiny dims on CPU.
"""

import numpy as np
import pytest

from audio_motion_avatar_tpu.models.config import AvatarConfig
from audio_motion_avatar_tpu.ops import smplx as smplx_ops

# integration tier: the fused-vs-sequential exactness check compiles
# two rollouts (~5 min on CPU) — far beyond the quick (<2 min) budget
pytestmark = pytest.mark.slow


def _build(fuse):
    from tools.serve_bench import build

    cfg = AvatarConfig.tiny(image_size=(32, 32))
    return build(
        batch=2, frames_per_chunk=cfg.triplane_output_frames,
        image_size=cfg.image_size, base_cfg=cfg, fuse_chunks=fuse,
        smplx_model=smplx_ops.synthetic_model(seed=0, num_verts=300),
        # tiny-profile knobs (build() otherwise pins full-dim serving
        # defaults: bf16 compute, unroll 8)
        frames_scan_unroll=1, compute_dtype=None)


def test_fused_two_chunks_match_sequential():
    rollout2, params, (tri, smpl, aud2, cam), (B, T_tot) = _build(2)
    T_out = T_tot // 2
    assert aud2.shape[1] == 2 * T_out
    T_in = tri.shape[1]

    rollout1, params1, _, _ = _build(1)
    for a, b in zip(np.asarray(params["audio_triplane"]
                               ["transformer"]["proj_in"]["kernel"]).ravel()[:4],
                    np.asarray(params1["audio_triplane"]
                               ["transformer"]["proj_in"]["kernel"]).ravel()[:4]):
        assert a == b, "same init seed must give identical params"

    # sequential reference: two single-chunk dispatches, host-side slide
    r1, t1, s1, _ = rollout1(params, tri, smpl, aud2[:, :T_out], cam)
    r2, t2, s2, _ = rollout1(params, np.asarray(t1)[:, -T_in:],
                             np.asarray(s1)[:, -T_in:], aud2[:, T_out:], cam)

    rendered_fused, t_fused, s_fused, _ = rollout2(params, tri, smpl,
                                                   aud2, cam)

    # Not asserting bitwise equality: the fused program is a larger XLA
    # graph and fusion boundaries may reorder reductions. Budget far inside
    # the 1e-2 frame-parity budget (BASELINE.md).
    np.testing.assert_allclose(np.asarray(rendered_fused[:, :T_out]),
                               np.asarray(r1), rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rendered_fused[:, T_out:]),
                               np.asarray(r2), rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_fused), np.asarray(t2),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_fused), np.asarray(s2),
                               rtol=0, atol=1e-5)
