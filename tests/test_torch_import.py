"""Torch-checkpoint import: build a synthetic Lightning state dict with the
reference's naming and verify the mapping lands in the right flax slots
with the right transposes."""

import numpy as np
import torch
import pytest

from audio_motion_avatar_tpu.models.config import AvatarConfig
from audio_motion_avatar_tpu.training import torch_import as ti

CFG = AvatarConfig.tiny()


def make_ref_state_dict(tmp_path):
    """Minimal subset of the reference checkpoint names
    (lightning_model_wrapper.py module tree)."""
    sd = {}
    P = "triplane_gaussian"
    # smplx decoder mlp + one head
    sd[f"{P}.smplx_decoder.mlp.0.weight"] = torch.randn(1024, 64)
    sd[f"{P}.smplx_decoder.mlp.0.bias"] = torch.randn(1024)
    sd[f"{P}.smplx_decoder.mlp.2.weight"] = torch.randn(512, 1024)
    sd[f"{P}.smplx_decoder.mlp.2.bias"] = torch.randn(512)
    sd[f"{P}.smplx_decoder.mlp.4.weight"] = torch.randn(256, 512)
    sd[f"{P}.smplx_decoder.mlp.4.bias"] = torch.randn(256)
    sd[f"{P}.smplx_decoder.dec_transl.weight"] = torch.randn(3, 256)
    sd[f"{P}.smplx_decoder.dec_transl.bias"] = torch.randn(3)
    # encoder bits
    e = f"{P}.smplx_triplane_encoder"
    sd[f"{e}.fc_pos.weight"] = torch.randn(64, 35)
    sd[f"{e}.fc_pos.bias"] = torch.randn(64)
    sd[f"{e}.vertex_emb.weight"] = torch.randn(100, 16)
    sd[f"{e}.smpl_tokens"] = torch.randn(32, 8)
    sd[f"{e}.blocks.0.fc_0.weight"] = torch.randn(32, 64)
    sd[f"{e}.blocks.0.fc_0.bias"] = torch.randn(32)
    sd[f"{e}.blocks.0.fc_1.weight"] = torch.zeros(32, 32)
    sd[f"{e}.blocks.0.fc_1.bias"] = torch.randn(32)
    sd[f"{e}.blocks.0.shortcut.weight"] = torch.randn(32, 64)
    # transformer block 0 of cross_attn
    t = f"{e}.cross_attn"
    sd[f"{t}.norm.weight"] = torch.randn(32)
    sd[f"{t}.norm.bias"] = torch.randn(32)
    sd[f"{t}.proj_in.weight"] = torch.randn(16, 32)
    sd[f"{t}.proj_in.bias"] = torch.randn(16)
    sd[f"{t}.proj_out.weight"] = torch.randn(32, 16)
    sd[f"{t}.proj_out.bias"] = torch.randn(32)
    sd[f"{t}.transformer_blocks.0.norm1.weight"] = torch.randn(16)
    sd[f"{t}.transformer_blocks.0.norm1.bias"] = torch.randn(16)
    sd[f"{t}.transformer_blocks.0.attn1.to_q.weight"] = torch.randn(16, 16)
    sd[f"{t}.transformer_blocks.0.attn1.to_out.0.weight"] = torch.randn(16, 16)
    sd[f"{t}.transformer_blocks.0.attn1.to_out.0.bias"] = torch.randn(16)
    sd[f"{t}.transformer_blocks.0.ff.net.0.proj.weight"] = torch.randn(128, 16)
    sd[f"{t}.transformer_blocks.0.ff.net.0.proj.bias"] = torch.randn(128)
    sd[f"{t}.transformer_blocks.0.ff.net.2.weight"] = torch.randn(16, 64)
    sd[f"{t}.transformer_blocks.0.ff.net.2.bias"] = torch.randn(16)
    # renderer heads
    sd[f"{P}.renderer.gaussian_decoder.xyz_layer.weight"] = torch.zeros(3, 99)
    sd[f"{P}.renderer.gaussian_decoder.xyz_layer.bias"] = torch.zeros(3)
    sd[f"{P}.renderer.gaussian_decoder.rotation_layer.weight"] = torch.zeros(4, 99)
    sd[f"{P}.renderer.gaussian_decoder.rotation_layer.bias"] = torch.tensor([1.0, 0, 0, 0])
    # sapiens junk that must be dropped
    sd[f"{P}.sapiens_encoder.model.blocks.0.weight"] = torch.randn(4, 4)

    path = str(tmp_path / "ref.ckpt")
    torch.save({"state_dict": sd}, path)
    return path, sd


def test_import_mapping(tmp_path):
    path, sd = make_ref_state_dict(tmp_path)
    params, report = ti.import_reference_checkpoint(path, CFG)

    # Linear transpose convention
    np.testing.assert_allclose(
        params["smplx_triplane_encoder"]["smpl_decoder"]["mlp1"]["kernel"],
        sd["triplane_gaussian.smplx_decoder.mlp.0.weight"].numpy().T)
    # head remap
    np.testing.assert_allclose(
        params["smplx_triplane_encoder"]["smpl_decoder"]["transl"]["bias"],
        sd["triplane_gaussian.smplx_decoder.dec_transl.bias"].numpy())
    # embedding direct
    np.testing.assert_allclose(
        params["smplx_triplane_encoder"]["vertex_emb"]["embedding"],
        sd["triplane_gaussian.smplx_triplane_encoder.vertex_emb.weight"].numpy())
    # transformer qkv + GEGLU
    blk = params["smplx_triplane_encoder"]["smpl_cross_attn"]["block_0"]
    np.testing.assert_allclose(
        blk["attn1"]["q"]["kernel"],
        sd["triplane_gaussian.smplx_triplane_encoder.cross_attn."
           "transformer_blocks.0.attn1.to_q.weight"].numpy().T)
    assert blk["ff"]["wi"]["kernel"].shape == (16, 128)
    # renderer head bias
    np.testing.assert_allclose(
        params["renderer"]["rotation_layer"]["bias"], [1, 0, 0, 0])
    assert report["loaded"] > 10


def test_merge_shape_check(tmp_path):
    path, sd = make_ref_state_dict(tmp_path)
    partial, _ = ti.import_reference_checkpoint(path, CFG)
    dst = {"renderer": {"rotation_layer": {"kernel": np.zeros((99, 4)),
                                           "bias": np.zeros(4)},
                        "xyz_layer": {"kernel": np.zeros((5, 3)),  # wrong shape
                                      "bias": np.zeros(3)}}}
    merged, mism = ti.merge_into(dst, {"renderer": partial["renderer"]})
    np.testing.assert_allclose(merged["renderer"]["rotation_layer"]["bias"],
                               [1, 0, 0, 0])
    assert any("xyz_layer" in m for m in mism)
