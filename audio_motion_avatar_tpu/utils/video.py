"""Host-side video IO (reference: src/main2.py:332-384): frame PNGs, mp4 via
cv2 VideoWriter, optional ffmpeg audio mux. Pure host code — never in the
accelerator path."""

from __future__ import annotations

import os
import subprocess
from typing import Optional, Sequence

import numpy as np


def write_frames(frames: Sequence[np.ndarray], out_dir: str, prefix: str = "frame"):
    from PIL import Image
    os.makedirs(out_dir, exist_ok=True)
    for i, f in enumerate(frames):
        img = np.clip(np.asarray(f) * 255, 0, 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(out_dir, f"{prefix}_{i:05d}.png"))


def write_mp4(frames: Sequence[np.ndarray], path: str, fps: int = 24,
              audio_path: Optional[str] = None):
    """frames: list of (H, W, 3) float [0,1]. Writes mp4; muxes audio via
    ffmpeg when available + provided (main2.py:367-384)."""
    import cv2
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    h, w = np.asarray(frames[0]).shape[:2]
    tmp = path if audio_path is None else path + ".noaudio.mp4"
    writer = cv2.VideoWriter(tmp, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for f in frames:
        img = np.clip(np.asarray(f) * 255, 0, 255).astype(np.uint8)
        writer.write(cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    writer.release()

    if audio_path is not None:
        try:
            subprocess.run(
                ["ffmpeg", "-y", "-i", tmp, "-i", audio_path, "-c:v", "copy",
                 "-c:a", "aac", "-shortest", path],
                check=True, capture_output=True)
            os.remove(tmp)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            print(f"[video] ffmpeg mux failed ({e}); keeping silent video")
            os.replace(tmp, path)
    return path
