"""Baseline motion-retargeting script (EMAGE npz -> LHM SMPLX JSONs).

Fixture test of baseline/audio_motion_retargeting/process_motion_seq.py
(reference: same-named script): rotation math against scipy-free oracles,
JSON layout, and the 180-degree X root flip."""

import importlib.util
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.quick

_SPEC = importlib.util.spec_from_file_location(
    "process_motion_seq",
    os.path.join(os.path.dirname(__file__), "..", "baseline",
                 "audio_motion_retargeting", "process_motion_seq.py"))
pms = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(pms)


def test_rotvec_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(50):
        rv = rng.randn(3) * rng.uniform(0, 3.0)
        m = pms.rotvec_to_matrix(rv)
        # valid rotation matrix
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-8)
        assert np.linalg.det(m) > 0.99
        rv2 = pms.matrix_to_rotvec(m)
        np.testing.assert_allclose(pms.rotvec_to_matrix(rv2), m, atol=1e-6)


def test_rotvec_near_pi():
    for axis in (np.array([1.0, 0, 0]), np.array([0, 1.0, 0]),
                 np.array([0.6, -0.64, 0.48]) / np.linalg.norm(
                     [0.6, -0.64, 0.48])):
        rv = axis * (np.pi - 1e-8)
        m = pms.rotvec_to_matrix(rv)
        rv2 = pms.matrix_to_rotvec(m)
        np.testing.assert_allclose(pms.rotvec_to_matrix(rv2), m, atol=1e-5)


def test_flip_root_x180_composition():
    rng = np.random.RandomState(1)
    rv = rng.randn(3) * 0.7
    flipped = pms.flip_root_x180(rv)
    rx = pms.rotvec_to_matrix(np.array([np.pi, 0, 0]))
    np.testing.assert_allclose(pms.rotvec_to_matrix(flipped),
                               rx @ pms.rotvec_to_matrix(rv), atol=1e-6)


def test_convert_npz_layout(tmp_path):
    rng = np.random.RandomState(2)
    T = 3
    poses = (rng.randn(T, 165) * 0.2).astype(np.float64)
    npz = tmp_path / "res_demo_clip.npz"
    np.savez(npz, poses=poses, trans=rng.randn(T, 3),
             betas=rng.randn(300))
    out_dir = pms.convert_npz(str(npz), str(tmp_path / "out"))
    assert out_dir.endswith(os.path.join("demo_clip_res_short",
                                         "smplx_params"))
    files = sorted(os.listdir(out_dir))
    assert files == [f"{i:06d}.json" for i in range(T)]
    fr = json.load(open(os.path.join(out_dir, "000001.json")))
    assert len(fr["betas"]) == 10
    np.testing.assert_allclose(
        np.asarray(fr["body_pose"]), poses[1, 3:66].reshape(21, 3))
    np.testing.assert_allclose(
        np.asarray(fr["lhand_pose"]), poses[1, 75:120].reshape(15, 3))
    np.testing.assert_allclose(
        np.asarray(fr["root_pose"]), pms.flip_root_x180(poses[1, 0:3]),
        atol=1e-9)
    # fixed LHM camera constants (reference :23-31)
    assert fr["trans"] == pms.FIXED_TRANS
    assert fr["focal"] == pms.FIXED_FOCAL
    assert fr["img_size_wh"] == pms.FIXED_IMG_WH
    assert fr["pad_ratio"] == 0
