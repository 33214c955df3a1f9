"""Golden-frame demo protocol test (VERDICT r2 #3b).

Runs the FULL two-stream demo (`parity_check --run` -> main2 demo: stage-1
init pass, autoregressive audio rollout, sliding token window, frame
writing — reference protocol src/main2.py:123-388) at the tiny profile on
CPU with deterministic seeds, then pushes the produced frames through the
SAME comparator gate a real-asset parity run will use (mean|diff| <= 1e-2,
PSNR >= 40 dB) against a checked-in golden fixture.

This exercises the complete parity *machinery* in CI — frame production,
ordering, encoding, comparison — so that when the released checkpoint and
real assets are mounted, `tools/parity_check.py --run --checkpoint ...`
only changes the weights, not the code path.

Regenerate the fixture after an intentional renderer/demo change:
  REGEN_DEMO_GOLDEN=1 python -m pytest tests/test_demo_golden.py -q
"""

import os
import shutil
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT / "tools"))
from parity_check import compare, run_ours  # noqa: E402

GOLDEN = Path(__file__).parent / "fixtures" / "demo_golden"
CONFIG = str(ROOT / "audio_motion_avatar_tpu" / "configs" / "config_tiny.yaml")
# Trained tiny-profile checkpoint (VERDICT r4 #7): the golden frames are
# rendered from CONVERGED weights (tiny stage-2 overfit via `main2 --mode
# train` on the synthetic clip — tools/make_tiny_ckpt.sh), so the gate pins
# semantic output, not random-init structure. Absent -> random-init golden
# (back-compat while the fixture regenerates).
CKPT = Path(__file__).parent / "fixtures" / "demo_tiny_ckpt"


def _ckpt():
    return str(CKPT) if CKPT.is_dir() else None


def _base_overrides():
    # with the trained fixture, drive the demo from the same rendered-body
    # synthetic data it was trained on (semantic frames end to end)
    return ["dataset.render_gt=true"] if CKPT.is_dir() else []


def test_demo_frames_match_golden(tmp_path):
    out = str(tmp_path / "parity_ours")
    run_ours(CONFIG, _ckpt(), out, None, overrides=_base_overrides())
    frames = Path(out) / "demo_outputs" / "frames"
    assert frames.is_dir() and any(frames.iterdir()), "demo produced no frames"

    if os.environ.get("REGEN_DEMO_GOLDEN"):
        if GOLDEN.exists():
            shutil.rmtree(GOLDEN)
        shutil.copytree(frames, GOLDEN)
        pytest.skip(f"regenerated {GOLDEN}")

    if not GOLDEN.exists():
        pytest.fail("golden fixture missing — run with REGEN_DEMO_GOLDEN=1")

    # the exact production parity gate (parity_check defaults)
    r = compare(str(frames), str(GOLDEN))
    assert r["pass"], r


def test_demo_fused_chunks_matches_golden(tmp_path):
    """demo_fuse_chunks=2 (in-graph window slide) must pass the same
    golden gate — the fused program is exact, incl. the unfused remainder
    chunk when n_chunks is odd."""
    if not GOLDEN.exists():
        pytest.skip("golden fixture missing")
    out = str(tmp_path / "parity_fused")
    run_ours(CONFIG, _ckpt(), out, None,
             overrides=_base_overrides() + ["model.demo_fuse_chunks=2"])
    frames = Path(out) / "demo_outputs" / "frames"
    assert frames.is_dir() and any(frames.iterdir())
    r = compare(str(frames), str(GOLDEN))
    assert r["pass"], r


def test_demo_gelu_tanh_within_parity_budget(tmp_path):
    """The gelu_approx serving knob (tanh instead of exact erf in the PTv3
    refiner MLPs + audio GEGLU — ~36 ms/rollout on v5e, BASELINE.md r4)
    must keep demo frames within the SAME production parity gate
    (mean|diff| <= 1e-2, PSNR >= 40 dB) vs the erf golden. This is the
    quality clearance for making tanh the serving default."""
    if not GOLDEN.exists():
        pytest.skip("golden fixture missing")
    out = str(tmp_path / "parity_gelu")
    run_ours(CONFIG, _ckpt(), out, None,
             overrides=_base_overrides() + ["model.gelu_approx=true"])
    frames = Path(out) / "demo_outputs" / "frames"
    assert frames.is_dir() and any(frames.iterdir())
    r = compare(str(frames), str(GOLDEN))
    assert r["pass"], r
