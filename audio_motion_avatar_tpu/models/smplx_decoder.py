"""SMPLX parameter decoder head.

Equivalent of the reference SMPLXDecoder (reference:
src/models/smplx_decoder.py:40-145): flatten tokens -> MLP(1024, 512, 256)
-> 10 linear heads; all rotations predicted in 6D and converted to
axis-angle. Returns the same param-dict layout:
  betas (B,10), transl (B,3), global_orient (B,3), body_pose (B,21,3),
  left/right_hand_pose (B,15,3), jaw/leye/reye_pose (B,3), expression (B,Ne).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ..ops.rotations import rotation_6d_to_axis_angle

BODY_JOINTS = 22   # incl. root
HAND_JOINTS = 15
SHAPE_DIM = 10


class SMPLXDecoder(nn.Module):
    token_dim: int
    token_len: int
    num_expression_coeffs: int = 10

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> dict:
        """tokens: (B, C, S) channel-first (as produced by the transformers)."""
        B = tokens.shape[0]
        x = tokens.reshape(B, -1)
        h = nn.Dense(1024, name="mlp1")(x)
        h = nn.relu(h)
        h = nn.Dense(512, name="mlp2")(h)
        h = nn.relu(h)
        h = nn.Dense(256, name="mlp3")(h)
        feats = nn.relu(h)

        def head(n, name):
            return nn.Dense(n, name=name)(feats)

        root6 = head(6, "body_root_pose")
        body6 = head((BODY_JOINTS - 1) * 6, "body_pose")
        betas = head(SHAPE_DIM, "body_shape")
        transl = head(3, "transl")
        hands6 = head(2 * HAND_JOINTS * 6, "hand_pose")
        expr = head(self.num_expression_coeffs, "face_expression")
        jaw6 = head(6, "face_jaw_pose")
        leye6 = head(6, "leye_pose")
        reye6 = head(6, "reye_pose")

        return {
            "betas": betas,
            "transl": transl,
            "global_orient": rotation_6d_to_axis_angle(root6),
            "body_pose": rotation_6d_to_axis_angle(
                body6.reshape(B, BODY_JOINTS - 1, 6)),
            "left_hand_pose": rotation_6d_to_axis_angle(
                hands6[:, : HAND_JOINTS * 6].reshape(B, HAND_JOINTS, 6)),
            "right_hand_pose": rotation_6d_to_axis_angle(
                hands6[:, HAND_JOINTS * 6:].reshape(B, HAND_JOINTS, 6)),
            "jaw_pose": rotation_6d_to_axis_angle(jaw6),
            "leye_pose": rotation_6d_to_axis_angle(leye6),
            "reye_pose": rotation_6d_to_axis_angle(reye6),
            "expression": expr,
        }
