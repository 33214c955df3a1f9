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


# ---------------------------------------------------------------------------
# Stage-2 (audio_triplane.*) import: forward agreement vs real torch modules
# ---------------------------------------------------------------------------

def _np_sd(torch_modules_prefixed):
    """{prefix: torch module} -> flat numpy state dict with reference names."""
    sd = {}
    for prefix, mod in torch_modules_prefixed.items():
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v.detach().numpy()
    return sd


def test_triplane_reducer_import_forward():
    """conv_time (depthwise Conv3d over T) == imported time_kernel einsum."""
    import torch.nn as tnn
    from audio_motion_avatar_tpu.models.audio_net import TriplaneTemporalReducer

    torch.manual_seed(0)
    B, T, C, R = 2, 2, 8, 4
    conv = tnn.Conv3d(3 * C, 3 * C, (T, 1, 1), groups=3 * C, bias=False)
    x = torch.randn(B, T, 3, C, R, R)
    # reference forward (triplane_audio_net.py:24-42)
    xp = x.permute(0, 2, 3, 1, 4, 5).contiguous().view(B, 3 * C, T, R, R)
    ref = conv(xp).view(B, 3, C, R, R).detach().numpy()  # time axis reduced

    sd = {"audio_triplane.triplane_motion_encoder.conv_time.weight":
          conv.weight.detach().numpy()}
    mapped = ti.map_audio_triplane(sd, CFG, [])
    # tokens: plane-major flatten (B, T, C, 3*R*R)
    import jax.numpy as jnp
    from audio_motion_avatar_tpu.ops.triplane import planes_to_tokens
    tokens = planes_to_tokens(jnp.asarray(x.numpy()))  # (B, T, C, 3R^2)
    mod = TriplaneTemporalReducer(channels=C, time_steps=T)
    out = mod.apply({"params": mapped["triplane_motion_encoder"]}, tokens)
    out_planes = np.asarray(out).reshape(B, C, 3, R, R).transpose(0, 2, 1, 3, 4)
    np.testing.assert_allclose(out_planes, ref, rtol=1e-5, atol=1e-5)


def test_smplx_reducer_import_forward():
    """torch MHA + LayerNorms + MLP == imported SMPLXTemporalReducer."""
    import torch.nn as tnn
    from audio_motion_avatar_tpu.models.audio_net import SMPLXTemporalReducer

    torch.manual_seed(1)
    B, T, C, L = 2, 2, 16, 5
    attn = tnn.MultiheadAttention(C, 8, dropout=0.1, batch_first=True).eval()
    norm1, norm2 = tnn.LayerNorm(C), tnn.LayerNorm(C)
    mlp = tnn.Sequential(tnn.Linear(C, 2 * C), tnn.ReLU(), tnn.Linear(2 * C, C))
    x = torch.randn(B, T, C, L)

    # reference forward (triplane_audio_net.py:66-91)
    with torch.no_grad():
        h = x.permute(0, 3, 1, 2).reshape(B * L, T, C)
        a, _ = attn(h, h, h)
        h = norm1(h + a)
        h = norm2(h + mlp(h))
        ref = h.mean(dim=1).reshape(B, L, C).permute(0, 2, 1).numpy()  # (B,C,L)

    s = "audio_triplane.smplx_motion_encoder"
    sd = _np_sd({f"{s}.self_attn": attn, f"{s}.norm1": norm1,
                 f"{s}.norm2": norm2, f"{s}.mlp": mlp})
    mapped = ti.map_audio_triplane(sd, CFG, [])
    import jax.numpy as jnp
    mod = SMPLXTemporalReducer(channels=C, time_steps=T, heads=8)
    out = mod.apply({"params": mapped["smplx_motion_encoder"]},
                    jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_transformer1d_import_forward():
    """Full Transformer1D mapping: hand-built torch twin of the reference
    Transformer1D_nn (GroupNorm -> proj_in -> pre-LN block with separate
    q/k/v, cross-attn, GEGLU FF -> proj_out + residual) vs imported flax."""
    import torch.nn as tnn
    import torch.nn.functional as tF
    from audio_motion_avatar_tpu.models.transformer import Transformer1D

    torch.manual_seed(2)
    B, C, S = 2, 16, 10
    heads, hd = 2, 8
    inner = heads * hd
    ctx_dim, T_ctx = 12, 3

    norm = tnn.GroupNorm(4, C, eps=1e-6)
    proj_in = tnn.Linear(C, inner)
    proj_out = tnn.Linear(inner, C)
    norm1, norm2, norm3 = (tnn.LayerNorm(inner) for _ in range(3))
    q1, k1, v1 = (tnn.Linear(inner, inner, bias=False) for _ in range(3))
    o1 = tnn.Linear(inner, inner)
    q2 = tnn.Linear(inner, inner, bias=False)
    k2 = tnn.Linear(ctx_dim, inner, bias=False)
    v2 = tnn.Linear(ctx_dim, inner, bias=False)
    o2 = tnn.Linear(inner, inner)
    ff_proj = tnn.Linear(inner, 8 * inner)  # GEGLU: 2 * (mult=4) * inner
    ff_out = tnn.Linear(4 * inner, inner)

    def mha(q, k, v, x, kv):
        Bq, Sq, _ = x.shape
        Tk = kv.shape[1]
        qh = q(x).view(Bq, Sq, heads, hd).transpose(1, 2)
        kh = k(kv).view(Bq, Tk, heads, hd).transpose(1, 2)
        vh = v(kv).view(Bq, Tk, heads, hd).transpose(1, 2)
        a = tF.softmax(qh @ kh.transpose(-1, -2) * hd ** -0.5, dim=-1) @ vh
        return a.transpose(1, 2).reshape(Bq, Sq, inner)

    x = torch.randn(B, C, S)
    ctx = torch.randn(B, T_ctx, ctx_dim)
    with torch.no_grad():
        h = norm(x).transpose(1, 2)           # (B, S, C)
        h = proj_in(h)
        h = h + o1(mha(q1, k1, v1, norm1(h), norm1(h)))
        h = h + o2(mha(q2, k2, v2, norm2(h), ctx))
        g = ff_proj(norm3(h))
        a, gate = g.chunk(2, dim=-1)
        h = h + ff_out(a * tF.gelu(gate))
        ref = (proj_out(h).transpose(1, 2) + x).numpy()

    t = "audio_triplane.transformer"
    sd = _np_sd({
        f"{t}.norm": norm, f"{t}.proj_in": proj_in, f"{t}.proj_out": proj_out,
        f"{t}.transformer_blocks.0.norm1": norm1,
        f"{t}.transformer_blocks.0.norm2": norm2,
        f"{t}.transformer_blocks.0.norm3": norm3,
        f"{t}.transformer_blocks.0.attn1.to_q": q1,
        f"{t}.transformer_blocks.0.attn1.to_k": k1,
        f"{t}.transformer_blocks.0.attn1.to_v": v1,
        f"{t}.transformer_blocks.0.attn1.to_out.0": o1,
        f"{t}.transformer_blocks.0.attn2.to_q": q2,
        f"{t}.transformer_blocks.0.attn2.to_k": k2,
        f"{t}.transformer_blocks.0.attn2.to_v": v2,
        f"{t}.transformer_blocks.0.attn2.to_out.0": o2,
        f"{t}.transformer_blocks.0.ff.net.0.proj": ff_proj,
        f"{t}.transformer_blocks.0.ff.net.2": ff_out,
    })
    loaded = []
    mapped = ti.map_transformer1d(sd, t, 1, loaded)
    import jax.numpy as jnp
    mod = Transformer1D(num_layers=1, heads=heads, head_dim=hd,
                        in_channels=C, context_dim=ctx_dim,
                        norm_num_groups=4, remat=False)
    out = mod.apply({"params": mapped}, jnp.asarray(x.numpy()),
                    jnp.asarray(ctx.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_stage2_import_no_structural_twin_skipped():
    """stage=2 import maps every audio_triplane module that has a structural
    twin — the report must show zero skipped audio_triplane entries."""
    import torch.nn as tnn
    torch.manual_seed(3)
    C = 16
    sd = {}
    conv = tnn.Conv3d(3 * C, 3 * C, (2, 1, 1), groups=3 * C, bias=False)
    sd["audio_triplane.triplane_motion_encoder.conv_time.weight"] = conv.weight
    attn = tnn.MultiheadAttention(C, 8, batch_first=True)
    for k, v in attn.state_dict().items():
        sd[f"audio_triplane.smplx_motion_encoder.self_attn.{k}"] = v
    for i, m in enumerate([tnn.LayerNorm(C), None, tnn.LayerNorm(C)]):
        if m is not None:
            for k, v in m.state_dict().items():
                sd[f"audio_triplane.smplx_motion_encoder.norm{1 if i == 0 else 2}.{k}"] = v
    mlp = tnn.Sequential(tnn.Linear(C, 2 * C), tnn.ReLU(), tnn.Linear(2 * C, C))
    for k, v in mlp.state_dict().items():
        sd[f"audio_triplane.smplx_motion_encoder.mlp.{k}"] = v
    t = "audio_triplane.transformer"
    sd[f"{t}.norm.weight"] = torch.randn(C)
    sd[f"{t}.norm.bias"] = torch.randn(C)
    sd[f"{t}.proj_in.weight"] = torch.randn(16, C)
    sd[f"{t}.proj_in.bias"] = torch.randn(16)
    sd[f"{t}.proj_out.weight"] = torch.randn(C, 16)
    sd[f"{t}.proj_out.bias"] = torch.randn(C)

    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "full.ckpt")
        torch.save({"state_dict": sd}, path)
        params, report = ti.import_reference_checkpoint(path, CFG, stage=2)
    assert "audio_triplane" in params
    assert "triplane_motion_encoder" in params["audio_triplane"]
    assert "transformer" in params["audio_triplane"]
    at_skipped = [m for m in report["skipped_modules"]
                  if m.startswith("audio_triplane")]
    assert at_skipped == [], at_skipped


def test_ptv3_block_import_forward():
    """Forward agreement: a reference PTv3 Block's attention+MLP weights
    (torch oracle re-stating pointtransformer_v3.py:528-615 math, CPE
    zeroed) mapped through map_ptv3_block into a SerialBlock produce the
    same output on an all-valid single patch."""
    import torch.nn as tnn
    import jax
    import jax.numpy as jnp
    from audio_motion_avatar_tpu.models.ptv3 import SerialBlock

    torch.manual_seed(0)
    C, H, P = 32, 4, 16
    D = C // H

    class OracleBlock(tnn.Module):
        # reference Block minus CPE/DropPath (identity at eval with cpe=0)
        def __init__(self):
            super().__init__()
            self.norm1 = tnn.LayerNorm(C)
            self.qkv = tnn.Linear(C, C * 3)
            self.proj = tnn.Linear(C, C)
            self.norm2 = tnn.LayerNorm(C)
            self.fc1 = tnn.Linear(C, C * 4)
            self.fc2 = tnn.Linear(C * 4, C)

        def forward(self, x):           # (P, C), one patch, all valid
            s = x
            h = self.norm1(x)
            qkv = self.qkv(h).reshape(1, P, 3, H, D).permute(2, 0, 3, 1, 4)
            q, k, v = qkv.unbind(0)
            attn = (q * D ** -0.5) @ k.transpose(-2, -1)
            attn = attn.softmax(dim=-1)
            h = (attn @ v).transpose(1, 2).reshape(P, C)
            x = s + self.proj(h)
            s = x
            h = self.fc2(tnn.functional.gelu(self.fc1(self.norm2(x))))
            return s + h

    oracle = OracleBlock().eval()
    x_np = np.random.RandomState(1).randn(P, C).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x_np)).numpy()

    # reference state-dict naming for one enc block
    bp = "pt.enc.enc0.block0"
    sd = {}
    for src, dst in [("norm1", "norm1.0"), ("qkv", "attn.qkv"),
                     ("proj", "attn.proj"), ("norm2", "norm2.0"),
                     ("fc1", "mlp.fc1"), ("fc2", "mlp.fc2")]:
        mod = getattr(oracle, src)
        sd[f"{bp}.{dst}.weight"] = mod.weight.detach()
        sd[f"{bp}.{dst}.bias"] = mod.bias.detach()

    loaded = []
    blk_params = ti.map_ptv3_block(sd, bp, H, loaded)
    assert {"ln1", "ln2", "attn", "mlp1", "mlp2"} <= set(blk_params)
    assert len(loaded) == 6

    block = SerialBlock(dim=C, heads=H, patch_size=P)
    variables = block.init(jax.random.PRNGKey(0),
                           jnp.asarray(x_np), jnp.ones((P,), bool))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    # zero the xCPE (the unmapped redesigned component)
    params["cpe"] = {k: np.zeros_like(v) for k, v in params["cpe"].items()}
    merged, mism = ti.merge_into(params, blk_params)
    assert not mism, mism
    got = np.asarray(block.apply({"params": merged}, jnp.asarray(x_np),
                                 jnp.ones((P,), bool)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_ptv3_unet_import_wiring():
    """map_ptv3 lands blocks at the right unet slots and the import report
    shows PTv3 partially loaded instead of wholly skipped."""
    cfg = CFG
    sd = {}
    pref = "triplane_gaussian.renderer.point_encoder.point_transformer"
    # one enc block at stage 0 (tiny cfg: enc_channels[0]=16, heads 2)
    C = cfg.ptv3_enc_channels[0]
    bp = f"{pref}.enc.enc0.block0"
    sd[f"{bp}.norm1.0.weight"] = torch.randn(C)
    sd[f"{bp}.norm1.0.bias"] = torch.randn(C)
    sd[f"{bp}.attn.qkv.weight"] = torch.randn(3 * C, C)
    sd[f"{bp}.attn.qkv.bias"] = torch.randn(3 * C)
    sd[f"{bp}.attn.proj.weight"] = torch.randn(C, C)
    sd[f"{bp}.attn.proj.bias"] = torch.randn(C)
    sd[f"{bp}.mlp.fc1.weight"] = torch.randn(4 * C, C)
    sd[f"{bp}.mlp.fc1.bias"] = torch.randn(4 * C)
    sd[f"{bp}.mlp.fc2.weight"] = torch.randn(C, 4 * C)
    sd[f"{bp}.mlp.fc2.bias"] = torch.randn(C)
    # an unmapped spconv CPE stays skipped
    sd[f"{bp}.cpe.0.weight"] = torch.randn(27, C, C)

    params, report = ti.map_reference_state_dict(sd, cfg, stage=1)
    unet = params["renderer"]["point_refiner"]["unet"]
    assert "enc0_b0" in unet
    q = unet["enc0_b0"]["attn"]["query"]["kernel"]
    assert q.shape == (C, cfg.ptv3_enc_heads[0], C // cfg.ptv3_enc_heads[0])
    # qkv split: query kernel equals the first C rows of qkv, transposed
    want_q = np.asarray(sd[f"{bp}.attn.qkv.weight"])[:C].T.reshape(q.shape)
    np.testing.assert_array_equal(q, want_q)
    assert any("cpe" in s for s in report["skipped_modules"])
