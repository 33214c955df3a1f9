"""Executable parity protocol vs the CUDA reference (BASELINE.md:20-24).

The parity definition for this build: on the released
`audio_motion_avatar_full.ckpt`, match the reference's demo outputs on
rendered frames (and optionally SMPLX params / gaussian attributes) within
a 1e-2 budget. The reference side is produced by running the CUDA repo's
demo (reference src/main2.py, mode demo) and keeping its per-frame PNGs;
this tool renders the same protocol here and compares.

Usage:
  # 1) produce our frames (imports the torch ckpt, affine-norm fold,
  #    two-stream demo — identical protocol to `main2 --mode demo`):
  python tools/parity_check.py --run --config <cfg.yaml> \
      --checkpoint audio_motion_avatar_full.ckpt --out /tmp/parity_ours
  # 2) compare against the reference's frame dir:
  python tools/parity_check.py --ours /tmp/parity_ours/demo_outputs/frames \
      --theirs <reference predict_results dir>

Reports per-frame PSNR, mean |diff|, and pass/fail against the budget
(mean |diff| <= 1e-2 in [0,1] units AND min PSNR >= 40 dB — the frame
form of the <=1e-2 parity budget). Exits nonzero on failure so it can
gate CI once the assets exist.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# `python tools/parity_check.py` puts tools/ (not the repo root) on
# sys.path; --run imports the package, so anchor the root explicitly.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_frames(d: str):
    import numpy as np
    try:
        import cv2

        def read(p):
            img = cv2.imread(p, cv2.IMREAD_COLOR)
            return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    except Exception:
        from PIL import Image

        def read(p):
            return np.asarray(Image.open(p).convert("RGB"))

    names = sorted(f for f in os.listdir(d)
                   if f.lower().endswith((".png", ".jpg", ".jpeg")))
    if not names:
        raise SystemExit(f"no frames in {d}")
    return names, [read(os.path.join(d, n)).astype("float32") / 255.0
                   for n in names]


def compare(ours_dir: str, theirs_dir: str, budget: float = 1e-2,
            min_psnr: float = 40.0) -> dict:
    import numpy as np
    names_a, ours = _load_frames(ours_dir)
    names_b, theirs = _load_frames(theirs_dir)
    n = min(len(ours), len(theirs))
    if len(ours) != len(theirs):
        print(f"[parity] frame count mismatch: {len(ours)} vs {len(theirs)}"
              f" — comparing the first {n}")
    psnrs, mads = [], []
    for a, b in zip(ours[:n], theirs[:n]):
        if a.shape != b.shape:
            raise SystemExit(f"frame shape mismatch: {a.shape} vs {b.shape}")
        mse = float(np.mean((a - b) ** 2))
        psnrs.append(10.0 * np.log10(1.0 / max(mse, 1e-12)))
        mads.append(float(np.mean(np.abs(a - b))))
    result = {
        "frames": n,
        "psnr_min": round(min(psnrs), 3),
        "psnr_mean": round(float(np.mean(psnrs)), 3),
        "mad_max": round(max(mads), 6),
        "mad_mean": round(float(np.mean(mads)), 6),
        "pass": bool(max(mads) <= budget and min(psnrs) >= min_psnr),
    }
    worst = int(np.argmin(psnrs))
    result["worst_frame"] = names_a[worst] if worst < len(names_a) else worst
    return result


def run_ours(config: str, checkpoint: str, out: str, audio: str | None,
             overrides=()):
    """Render our side via the main2 demo entry (identical protocol)."""
    from audio_motion_avatar_tpu import main2
    argv = ["--config", config, "--mode", "demo", "--output",
            os.path.join(out, "sequence.mp4"),
            "training.output_dir=" + out, *overrides]
    if checkpoint:
        argv += ["--checkpoint", checkpoint]
    if audio:
        argv += ["--audio", audio]
    main2.main(argv)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", action="store_true",
                    help="render our frames first (needs assets)")
    ap.add_argument("--config")
    ap.add_argument("--checkpoint")
    ap.add_argument("--audio")
    ap.add_argument("--out", default="/tmp/parity_ours")
    ap.add_argument("--ours", help="dir of our rendered frames")
    ap.add_argument("--theirs", help="dir of reference-rendered frames")
    ap.add_argument("--budget", type=float, default=1e-2)
    ap.add_argument("--min-psnr", type=float, default=40.0)
    args = ap.parse_args(argv)

    if args.run:
        if not args.config:
            ap.error("--run needs --config")
        run_ours(args.config, args.checkpoint, args.out, args.audio)
        if not args.ours:
            args.ours = os.path.join(args.out, "demo_outputs", "frames")
    if not (args.ours and args.theirs):
        print("[parity] frames rendered; pass --ours/--theirs to compare")
        return 0
    result = compare(args.ours, args.theirs, args.budget, args.min_psnr)
    print(json.dumps(result))
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
