"""Upsampler + point-refiner torch import: forward agreement against a
torch oracle built to the reference TriplaneUpsampler spec
(renderer.py:348-417), with eval-mode BatchNorm running stats folded into
the flax 'affine' norm slots."""

import numpy as np
import torch
import pytest

import jax
import jax.numpy as jnp

from audio_motion_avatar_tpu.models.config import AvatarConfig
from audio_motion_avatar_tpu.models.upsampler import TriplaneUpsampler
from audio_motion_avatar_tpu.training import torch_import as ti

C, NBLK = 8, 2


class _TorchResBlock(torch.nn.Module):
    def __init__(self, c):
        super().__init__()
        self.block = torch.nn.Sequential(
            torch.nn.BatchNorm2d(c), torch.nn.ReLU(),
            torch.nn.Conv2d(c, c, 3, padding=1),
            torch.nn.BatchNorm2d(c), torch.nn.ReLU(),
            torch.nn.Conv2d(c, c, 3, padding=1))
        self.skip = torch.nn.Identity()  # in == out channels

    def forward(self, x):
        return self.skip(x) + self.block(x)


class _TorchUpsampleBlock(torch.nn.Module):
    def __init__(self, c):
        super().__init__()
        self.upsample = torch.nn.Sequential(
            torch.nn.Upsample(scale_factor=2, mode="nearest"),
            torch.nn.Conv2d(c, c, 3, padding=1),
            torch.nn.ReLU(),
            _TorchResBlock(c))

    def forward(self, x):
        return self.upsample(x)


class _TorchTriplaneUpsampler(torch.nn.Module):
    """Oracle with the reference's exact module layout + recurrence:
    x_{i+1} = up_i(x_i) + skip_i, skip running nearest-2x (1x1-projected
    once at i=0)."""

    def __init__(self, c, n):
        super().__init__()
        self.upsample_blocks = torch.nn.ModuleList(
            [_TorchUpsampleBlock(c) for _ in range(n)])
        self.skip_connections = torch.nn.ModuleList([
            torch.nn.Sequential(
                torch.nn.Conv2d(c, c, 1) if i == 0 else torch.nn.Identity(),
                torch.nn.Upsample(scale_factor=2, mode="nearest"))
            for i in range(n)])

    def forward(self, tri):
        B, P, c, H, W = tri.shape
        x = tri.reshape(B * P, c, H, W)
        skip = x
        for up, sc in zip(self.upsample_blocks, self.skip_connections):
            u = up(x)
            skip = sc(skip)
            x = u + skip
        return x.reshape(B, P, c, x.shape[-2], x.shape[-1])


def _randomized_oracle(seed=0):
    torch.manual_seed(seed)
    m = _TorchTriplaneUpsampler(C, NBLK).eval()
    # non-trivial running stats + BN affines (defaults are identity)
    for mod in m.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.copy_(torch.randn(C) * 0.3)
            mod.running_var.copy_(torch.rand(C) + 0.5)
            mod.weight.data.copy_(torch.randn(C) * 0.5 + 1.0)
            mod.bias.data.copy_(torch.randn(C) * 0.2)
    return m


def _import_params(m, flax_init):
    sd = {f"U.{k}": v.detach().numpy() for k, v in m.state_dict().items()}
    mapped = ti.map_upsampler(sd, "U", NBLK, [])
    merged, mismatches = ti.merge_into(flax_init, mapped)
    assert mismatches == [], mismatches
    return merged


@pytest.mark.slow
def test_upsampler_forward_agreement():
    m = _randomized_oracle()
    tri = torch.randn(1, 3, C, 4, 4)
    with torch.no_grad():
        ref = m(tri).numpy()

    ups = TriplaneUpsampler(feature_dim=C, num_blocks=NBLK,
                            norm_mode="affine")
    planes = jnp.asarray(tri.numpy())
    vars0 = ups.init(jax.random.PRNGKey(0), planes)
    merged = _import_params(m, vars0["params"])
    out = np.asarray(ups.apply({"params": merged}, planes))

    assert out.shape == ref.shape == (1, 3, C, 16, 16)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_upsampler_affine_sparse_matches_dense():
    """In affine mode the sparse final level has NO statistics deviation:
    covered tiles must equal the dense output exactly."""
    m = _randomized_oracle(seed=1)
    ups_d = TriplaneUpsampler(feature_dim=C, num_blocks=NBLK,
                              norm_mode="affine", channels_last=True)
    ups_s = TriplaneUpsampler(feature_dim=C, num_blocks=NBLK,
                              norm_mode="affine", channels_last=True,
                              sparse_final=True, sparse_max_tiles=4,
                              sparse_tile_px=8)
    planes = jnp.asarray(np.random.default_rng(0)
                         .standard_normal((1, 3, C, 4, 4)), jnp.float32)
    vars0 = ups_d.init(jax.random.PRNGKey(0), planes)
    merged = {"params": _import_params(m, vars0["params"])}

    dense = np.asarray(ups_d.apply(merged, planes))      # (1,3,16,16,C)
    uv = jnp.zeros((1, 3, 5, 2), jnp.float32)            # center tile points
    sp = ups_s.apply(merged, planes, points_uv=uv)
    tiles = np.asarray(sp.tiles)
    slot = np.asarray(sp.slot)
    T, G = sp.tile_px, sp.grid
    for p in range(3):
        for t in range(G * G):
            s = slot[0, p, t]
            if s < 0:
                continue
            r, c = (t // G) * T, (t % G) * T
            np.testing.assert_allclose(
                tiles[0, p, s], dense[0, p, r:r + T, c:c + T], atol=1e-5)


def test_full_import_carries_upsampler_and_refiner(tmp_path):
    m = _randomized_oracle()
    P = "triplane_gaussian"
    sd = {f"{P}.renderer.triplane_upsampler.{k}": v
          for k, v in m.state_dict().items()}
    torch.manual_seed(3)
    for i in (0, 2, 4):
        o = 3 if i == 4 else 256
        sd[f"{P}.renderer.point_refiner.{i}.weight"] = torch.randn(o, 256)
        sd[f"{P}.renderer.point_refiner.{i}.bias"] = torch.randn(o)
    path = str(tmp_path / "ref.ckpt")
    torch.save({"state_dict": sd}, path)

    cfg = AvatarConfig.tiny()
    params, report = ti.import_reference_checkpoint(path, cfg)
    rend = params["renderer"]
    # upsampler conv + folded norm slots present (tiny profile has 1 block)
    assert "conv_kernel" in rend["upsampler"]["up_0"]
    assert set(rend["upsampler"]["up_0"]["res"]) >= {"norm1", "norm2",
                                                     "conv1", "conv2"}
    assert rend["upsampler"]["skip_proj"]["kernel"].shape == (1, 1, C, C)
    # BN fold is the exact eval-mode affine
    bn_w = sd[f"{P}.renderer.triplane_upsampler.upsample_blocks.0.upsample"
              ".3.block.0.weight"].numpy()
    bn_rv = sd[f"{P}.renderer.triplane_upsampler.upsample_blocks.0.upsample"
               ".3.block.0.running_var"].numpy()
    np.testing.assert_allclose(
        rend["upsampler"]["up_0"]["res"]["norm1"]["scale"],
        bn_w / np.sqrt(bn_rv + 1e-5), rtol=1e-6)
    # refiner MLP mapped with the Dense transpose
    np.testing.assert_allclose(
        rend["refine_mlp"]["layers_4"]["kernel"],
        sd[f"{P}.renderer.point_refiner.4.weight"].numpy().T)
    assert any("affine" in n for n in report.get("notes", []))


def test_cli_affine_default_on_torch_file(tmp_path):
    from audio_motion_avatar_tpu.configs.loader import Config
    from audio_motion_avatar_tpu.configs.build import (
        default_affine_norm_for_import)
    f = tmp_path / "ref.ckpt"
    f.write_bytes(b"x")
    cfg = Config.wrap({"model": {"renderer": {}}})
    cfg = default_affine_norm_for_import(cfg, str(f))
    assert cfg["model"]["renderer"]["upsampler_norm"] == "affine"
    # explicit YAML/CLI setting wins
    cfg2 = Config.wrap({"model": {"renderer": {"upsampler_norm": "group"}}})
    cfg2 = default_affine_norm_for_import(cfg2, str(f))
    assert cfg2["model"]["renderer"]["upsampler_norm"] == "group"
    # directories (orbax restore) leave the default alone
    cfg3 = Config.wrap({})
    cfg3 = default_affine_norm_for_import(cfg3, str(tmp_path))
    assert "renderer" not in cfg3.get("model", {})
