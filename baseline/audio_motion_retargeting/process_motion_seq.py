"""EMAGE -> LHM motion retargeting glue (two-stage baseline pipeline step 2).

Converts EMAGE inference output (npz with poses (T, 165), trans (T, 3),
betas) into per-frame LHM-format SMPLX JSONs, recomposing the root
orientation with an extra 180-degree X rotation and emitting the fixed
camera constants the LHM step expects (reference:
baseline/audio_motion_retargeting/process_motion_seq.py:23-89). The 165-d
pose layout: root 3 | body 63 | jaw 3 | leye 3 | reye 3 | lhand 45 | rhand 45.

Usage:
  python baseline/audio_motion_retargeting/process_motion_seq.py \
      --motion_folder <emage_npz_dir> --output_folder <out_dir>
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np

FIXED_TRANS = [0.02096693404018879, 0.3983211815357208, 2.393183946609497]
FIXED_FOCAL = [1000, 1000]
FIXED_PRINCPT = [345.0, 614.0]
FIXED_IMG_WH = [691, 1229]


def rotvec_to_matrix(rv: np.ndarray) -> np.ndarray:
    angle = np.linalg.norm(rv)
    if angle < 1e-9:
        return np.eye(3)
    axis = rv / angle
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


def matrix_to_rotvec(m: np.ndarray) -> np.ndarray:
    cos = np.clip((np.trace(m) - 1) / 2, -1.0, 1.0)
    angle = np.arccos(cos)
    if angle < 1e-9:
        return np.zeros(3)
    if np.pi - angle < 1e-6:  # near-pi: extract axis from (m + I)/2 diagonal
        A = (m + np.eye(3)) / 2.0
        axis = np.sqrt(np.clip(np.diag(A), 0, None))
        # fix signs from off-diagonals
        if A[0, 1] < 0:
            axis[1] = -axis[1]
        if A[0, 2] < 0:
            axis[2] = -axis[2]
        axis = axis / np.linalg.norm(axis)
        return axis * angle
    v = np.array([m[2, 1] - m[1, 2], m[0, 2] - m[2, 0], m[1, 0] - m[0, 1]])
    return v / (2 * np.sin(angle)) * angle


def flip_root_x180(root_pose: np.ndarray) -> np.ndarray:
    """R_final = Rx(180) @ R_orig (the baseline's coordinate bridge)."""
    rx = rotvec_to_matrix(np.array([np.pi, 0.0, 0.0]))
    return matrix_to_rotvec(rx @ rotvec_to_matrix(root_pose))


def convert_npz(npz_path: str, output_base: str) -> str:
    data = np.load(npz_path)
    betas = np.asarray(data["betas"]).reshape(-1)[:10].tolist()
    poses = np.asarray(data["poses"])  # (T, 165)
    name = os.path.splitext(os.path.basename(npz_path))[0].replace("res_", "")
    out_dir = os.path.join(output_base, f"{name}_res_short", "smplx_params")
    os.makedirs(out_dir, exist_ok=True)

    for i in range(poses.shape[0]):
        p = poses[i]
        frame = {
            "betas": betas,
            "root_pose": flip_root_x180(p[0:3]).tolist(),
            "body_pose": p[3:66].reshape(21, 3).tolist(),
            "jaw_pose": p[66:69].tolist(),
            "leye_pose": p[69:72].tolist(),
            "reye_pose": p[72:75].tolist(),
            "lhand_pose": p[75:120].reshape(15, 3).tolist(),
            "rhand_pose": p[120:165].reshape(15, 3).tolist(),
            "trans": FIXED_TRANS,
            "focal": FIXED_FOCAL,
            "princpt": FIXED_PRINCPT,
            "img_size_wh": FIXED_IMG_WH,
            "pad_ratio": 0,
        }
        with open(os.path.join(out_dir, f"{i:06d}.json"), "w") as f:
            json.dump(frame, f, indent=2)
    return out_dir


def main():
    ap = argparse.ArgumentParser(description="EMAGE npz -> LHM smplx JSONs")
    ap.add_argument("--motion_folder", "--moiton_folder", dest="motion_folder",
                    type=str, required=True)
    ap.add_argument("--output_folder", type=str,
                    default="tmp_data/output_motion_pretrain")
    args = ap.parse_args()

    files = glob.glob(os.path.join(args.motion_folder, "*.npz"))
    print(f"found {len(files)} npz files")
    for f in files:
        out = convert_npz(f, args.output_folder)
        print(f"{os.path.basename(f)} -> {out}")


if __name__ == "__main__":
    main()
