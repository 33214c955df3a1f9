"""The parity-protocol comparator (tools/parity_check.py): identical frame
dirs pass, frames past the 1e-2 budget fail."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
from parity_check import compare  # noqa: E402


def _write(d, frames):
    from PIL import Image
    d.mkdir(parents=True, exist_ok=True)
    for i, f in enumerate(frames):
        Image.fromarray((f * 255).astype(np.uint8)).save(d / f"{i:05d}.png")


@pytest.mark.quick
def test_identical_frames_pass(tmp_path):
    rng = np.random.default_rng(0)
    frames = [rng.random((16, 16, 3)).astype(np.float32) for _ in range(3)]
    _write(tmp_path / "a", frames)
    _write(tmp_path / "b", frames)
    r = compare(str(tmp_path / "a"), str(tmp_path / "b"))
    assert r["pass"] and r["frames"] == 3 and r["mad_max"] == 0.0


@pytest.mark.quick
def test_out_of_budget_fails(tmp_path):
    rng = np.random.default_rng(1)
    frames = [rng.random((16, 16, 3)).astype(np.float32) for _ in range(2)]
    shifted = [np.clip(f + 0.05, 0, 1) for f in frames]
    _write(tmp_path / "a", frames)
    _write(tmp_path / "b", shifted)
    r = compare(str(tmp_path / "a"), str(tmp_path / "b"))
    assert not r["pass"] and r["mad_max"] > 1e-2
