"""Synthetic CRUW-format dataset generator.

Writes a miniature dataset with the exact on-disk layout the reference
consumes (``file_meta.txt``, ``Train.json``/``Test.json``,
``<seq>/<rdr_dir>/<frame>.npy`` cubes — cruw_pose.py:61-106, 167-185) so the
full train/test CLI path, loaders and evaluation run end-to-end without the
(unreleased-scale) real RT-Pose data.  Cubes carry signal: an intensity blob
at each keypoint over a noise floor, so models can actually fit them.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Tuple

import numpy as np

ROI1 = {"z": [-1.0875000000000021, 4.7125],
        "y": [-5.0250000000000234, 5.024999999999931],
        "x": [0.7703125, 8.0203125]}


DEFAULT_PELVIS_RANGE = {"x": (2.0, 7.0), "y": (-3.5, 3.5), "z": (0.8, 1.2)}


def _random_pose(rng: np.random.Generator, pelvis_range=None,
                 offset_scale=(0.25, 0.25, 0.35), z_clip=(-0.9, 2.0)) -> np.ndarray:
    """A 15-joint skeleton-ish pose inside the ROI (meters, xyz)."""
    pr = pelvis_range or DEFAULT_PELVIS_RANGE
    pelvis = np.array([
        rng.uniform(*pr["x"]),          # x (range)
        rng.uniform(*pr["y"]),          # y (azimuth)
        rng.uniform(*pr["z"]),          # z (pelvis height)
    ])
    offsets = rng.normal(scale=offset_scale, size=(15, 3))
    offsets[0] = 0.0
    pose = pelvis[None] + offsets
    pose[:, 2] = np.clip(pose[:, 2], *z_clip)
    return pose


def generate_synthetic_dataset(root: str, num_seqs: int = 2,
                               frames_per_seq: int = 8, doppler_bins: int = 32,
                               rdr_type: str = "dzyx_real", seed: int = 0,
                               full_zyx: Tuple[int, int, int] = (32, 128, 256),
                               dtype=np.float16, pelvis_range=None,
                               offset_scale=(0.25, 0.25, 0.35),
                               z_clip=(-0.9, 2.0)) -> Dict[str, list]:
    """Create the dataset under ``root``; returns {split: [sample keys]}."""
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    with_doppler = "d" in rdr_type
    is_complex = "complex" in rdr_type
    rdr_dir = ("DZYX_npy_f16_complex" if is_complex
               else "DZYX_npy_f16" if with_doppler else "npy")
    if not with_doppler:
        dtype = np.float32  # zyx_real magnitudes (~2e5) overflow f16

    # normalization window the loader will apply (config NORMALIZING_VALUE)
    n0, n1 = (0.0, 10.0) if with_doppler else (150000.0, 200000.0)

    # world axes of the FULL cube (pre-ROI)
    Z, Y, X = full_zyx
    arr_z = np.arange(-5.8, 5.8, 11.6 / 32)
    arr_y = np.arange(-10.05, 10.05, 20.1 / 128)
    arr_x = np.arange(0, 11.6, 11.6 / 256)

    meta_lines = []
    splits = {"Train": {}, "Test": {}}
    keys = {"Train": [], "Test": []}
    for s in range(num_seqs):
        seq_id = str(s)
        seq_name = f"2024_0101_{1000 + s}"
        meta_lines.append(f"{seq_id},{seq_name}")
        cube_dir = os.path.join(root, seq_name, rdr_dir)
        os.makedirs(cube_dir, exist_ok=True)
        for split in ("Train", "Test"):
            splits[split].setdefault(seq_id, {})
            for fi in range(frames_per_seq):
                frame = f"{split.lower()}_{fi:04d}"
                rdr_frame = f"{len(os.listdir(cube_dir)):06d}"
                pose = _random_pose(rng, pelvis_range, offset_scale, z_clip)

                cube = rng.uniform(n0, n0 + 0.1 * (n1 - n0),
                                   size=(Z, Y, X)).astype(np.float32)
                # intensity blobs at keypoints (nearest-voxel + neighborhood)
                zi = np.clip(np.searchsorted(arr_z, pose[:, 2]), 1, Z - 2)
                yi = np.clip(np.searchsorted(arr_y, pose[:, 1]), 1, Y - 2)
                xi = np.clip(np.searchsorted(arr_x, pose[:, 0]), 1, X - 2)
                for j in range(15):
                    # deterministic per-joint intensity level: gives joints an
                    # identity signature so keypoint regression is learnable
                    # from synthetic data (real radar encodes identity via
                    # Doppler/reflectivity structure)
                    level = 0.35 + 0.04 * j + 0.05 * rng.random()
                    cube[zi[j]-1:zi[j]+2, yi[j]-1:yi[j]+2, xi[j]-1:xi[j]+2] = (
                        n0 + level * (n1 - n0))
                if with_doppler:
                    dop = rng.dirichlet(np.ones(doppler_bins)).astype(np.float32)
                    full = cube[None] * (dop[:, None, None, None] * doppler_bins)
                    if is_complex:
                        # pre-normalized (real, imag) pair (get_cube_phase
                        # loads without the normalize step)
                        full = (full - n0) / (n1 - n0)
                        phase = rng.uniform(0, 2 * np.pi,
                                            size=full.shape).astype(np.float32)
                        full = np.stack([full * np.cos(phase),
                                         full * np.sin(phase)])
                else:
                    full = cube
                np.save(os.path.join(cube_dir, f"{rdr_frame}.npy"),
                        full.astype(dtype))

                splits[split][seq_id][frame] = [{
                    "Radar_frameID": rdr_frame,
                    "pose": pose.tolist(),
                }]
                keys[split].append(f"{seq_id}/{frame}/{rdr_frame}")

    with open(os.path.join(root, "file_meta.txt"), "w") as f:
        f.write("\n".join(meta_lines) + "\n")
    for split in ("Train", "Test"):
        with open(os.path.join(root, f"{split}.json"), "w") as f:
            json.dump(splits[split], f)
    return keys


def dataset_cfg(root: str, rdr_type: str = "dzyx_real") -> dict:
    """A DATASET config dict (reference schema) pointing at ``root``."""
    with_doppler = "d" in rdr_type
    return dict(
        DIR=dict(ROOT_DIR=root, META_FILE="file_meta.txt"),
        LABEL=dict(IS_CONSIDER_ROI=True, ROI_TYPE="roi1",
                   CONSIDER_RADAR_VISIBILITY=False),
        ROI=dict(roi1=ROI1),
        RDR_TYPE=rdr_type,
        RDR_CUBE=dict(IS_CONSIDER_ROI=True, ROI_TYPE="roi1",
                      GRID_SIZE=[0.0453125, 0.15703125, 0.3625],
                      NORMALIZING_VALUE=(150000, 200000)),
        DZYX=dict(IS_CONSIDER_ROI=True, ROI_TYPE="roi1",
                  GRID_SIZE=[0.0453125, 0.15703125, 0.3625],
                  NORMALIZING_VALUE=(0.0, 10.0), REDUCE_TYPE="none"),
        ENABLE_SENSOR=["RADAR"],
    )
