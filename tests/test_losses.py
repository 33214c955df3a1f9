import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from audio_motion_avatar_tpu.utils import losses as L


def _torch_ssim(img1, img2, window_size=11):
    """Direct transliteration of the reference SSIM (loss_utils.py:44-82)
    used as an oracle here."""
    from math import exp
    B, T = img1.shape[:2]
    img1 = img1.reshape(-1, *img1.shape[2:]).permute(0, 3, 1, 2)
    img2 = img2.reshape(-1, *img2.shape[2:]).permute(0, 3, 1, 2)
    channel = img1.size(1)
    g = torch.tensor([exp(-(x - window_size // 2) ** 2 / (2 * 1.5 ** 2)) for x in range(window_size)])
    g = (g / g.sum()).unsqueeze(1)
    w2 = g.mm(g.t()).float().unsqueeze(0).unsqueeze(0)
    window = w2.expand(channel, 1, window_size, window_size).contiguous()
    mu1 = F.conv2d(img1, window, padding=window_size // 2, groups=channel)
    mu2 = F.conv2d(img2, window, padding=window_size // 2, groups=channel)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = F.conv2d(img1 * img1, window, padding=window_size // 2, groups=channel) - mu1_sq
    s2 = F.conv2d(img2 * img2, window, padding=window_size // 2, groups=channel) - mu2_sq
    s12 = F.conv2d(img1 * img2, window, padding=window_size // 2, groups=channel) - mu1_mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return m.mean().item()


def test_ssim_matches_reference_formula():
    rng = np.random.RandomState(0)
    a = rng.rand(2, 3, 24, 20, 3).astype(np.float32)
    b = np.clip(a + 0.1 * rng.randn(2, 3, 24, 20, 3).astype(np.float32), 0, 1)
    ours = float(L.ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = _torch_ssim(torch.from_numpy(a), torch.from_numpy(b))
    assert abs(ours - ref) < 1e-4, (ours, ref)


def test_ssim_identical_images():
    a = jnp.asarray(np.random.RandomState(1).rand(1, 2, 16, 16, 3).astype(np.float32))
    assert float(L.ssim(a, a)) > 0.999


def test_l1_l2():
    a = jnp.zeros((2, 3))
    b = jnp.ones((2, 3)) * 2
    assert float(L.l1_loss(a, b)) == 2.0
    assert float(L.l2_loss(a, b)) == 4.0


def test_geodesic_zero_for_same():
    aa = jnp.asarray(np.random.RandomState(2).randn(10, 3).astype(np.float32))
    v = float(L.rotation_geodesic_loss(aa, aa))
    assert v < 0.05  # clamp at 0.999 keeps it from exact zero


def test_geodesic_known_angle():
    a = jnp.zeros((1, 3))
    b = jnp.asarray([[0.0, 0.0, np.pi / 2]])
    v = float(L.rotation_geodesic_loss(a, b))
    assert abs(v - np.pi / 2) < 1e-3


def test_smplx_param_loss_structure():
    rng = np.random.RandomState(3)
    pred = {
        "betas": jnp.asarray(rng.randn(2, 10).astype(np.float32)),
        "global_orient": jnp.asarray(rng.randn(2, 3).astype(np.float32) * 0.1),
        "body_pose": jnp.asarray(rng.randn(2, 21, 3).astype(np.float32) * 0.1),
        "expression": jnp.asarray(rng.randn(2, 10).astype(np.float32)),
        "transl": jnp.asarray(rng.randn(2, 3).astype(np.float32)),
    }
    total, parts = L.smplx_param_loss(pred, pred)
    assert "betas_mse" in parts and "global_orient_geo" in parts
    assert float(parts["betas_mse"]) == 0.0
    assert float(parts["transl_smoothl1"]) == 0.0
    # only the priors and clamped geodesics contribute
    assert float(total) < 0.2


def test_psnr():
    a = jnp.zeros((4, 4))
    b = jnp.full((4, 4), 0.1)
    assert abs(float(L.psnr(a, b)) - 20.0) < 1e-4
