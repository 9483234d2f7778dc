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

# Upright 15-joint skeleton, meters relative to the pelvis, person facing
# the radar (+x range, +y lateral, +z up).  Joint order matches the CRUW
# keypoint meta (Pelvis, R leg, L leg, spine/head, L arm, R arm).
SKELETON_TEMPLATE = np.array([
    [0.00,  0.00,  0.00],   # Pelvis
    [0.00, -0.12, -0.05],   # RHip
    [0.02, -0.14, -0.45],   # RKnee
    [0.03, -0.15, -0.85],   # RAnkle
    [0.00,  0.12, -0.05],   # LHip
    [0.02,  0.14, -0.45],   # LKnee
    [0.03,  0.15, -0.85],   # LAnkle
    [0.00,  0.00,  0.25],   # Torso
    [0.00,  0.00,  0.50],   # Neck
    [0.01,  0.00,  0.68],   # Head
    [0.00,  0.20,  0.45],   # LShoulder
    [0.06,  0.30,  0.20],   # LElbow
    [0.10,  0.32, -0.02],   # LWrist
    [0.00, -0.20,  0.45],   # RShoulder
    [0.06, -0.30,  0.20],   # RElbow
], dtype=np.float64)


def _random_pose(rng: np.random.Generator, pelvis_range=None,
                 offset_scale=(0.25, 0.25, 0.35), z_clip=(-0.9, 2.0),
                 pose_mode: str = "gaussian") -> np.ndarray:
    """A 15-joint pose inside the ROI (meters, xyz).

    ``pose_mode='gaussian'``: i.i.d. normal offsets around the pelvis — the
    per-joint offset distribution is zero-mean, so predict-the-mean is near
    optimal; good for plumbing tests only.
    ``pose_mode='skeleton'``: a human skeleton template under random yaw /
    scale / limb jitter — offsets are large (up to ~0.9 m) and structured,
    so only a model that reads the per-joint blobs can score well.
    """
    pr = pelvis_range or DEFAULT_PELVIS_RANGE
    pelvis = np.array([
        rng.uniform(*pr["x"]),          # x (range)
        rng.uniform(*pr["y"]),          # y (azimuth)
        rng.uniform(*pr["z"]),          # z (pelvis height)
    ])
    if pose_mode == "skeleton":
        yaw = rng.uniform(0, 2 * np.pi)
        c, s = np.cos(yaw), np.sin(yaw)
        rot = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
        scale = rng.uniform(0.85, 1.15)
        offsets = (scale * SKELETON_TEMPLATE) @ rot.T
        offsets += rng.normal(scale=0.03, size=(15, 3))
        offsets[0] = 0.0
    else:
        offsets = rng.normal(scale=offset_scale, size=(15, 3))
        offsets[0] = 0.0
    pose = pelvis[None] + offsets
    pose[:, 2] = np.clip(pose[:, 2], *z_clip)
    return pose


# bone segments of the 15-joint skeleton (index pairs into the template)
SKELETON_EDGES = ((0, 1), (1, 2), (2, 3), (0, 4), (4, 5), (5, 6),
                  (0, 7), (7, 8), (8, 9), (8, 10), (10, 11), (11, 12),
                  (8, 13), (13, 14))


def _pose_point_cloud(rng: np.random.Generator, pose: np.ndarray,
                      points_per_bone: int = 18,
                      clutter: int = 160) -> np.ndarray:
    """Sample a LiDAR return set (N, 4) xyz+intensity from a skeleton pose.

    Points lie on the body: along each bone segment with surface jitter,
    densest near joints, plus ground-plane and uniform clutter returns.
    Each joint region carries a deterministic intensity level (mirroring the
    radar generator's identity signatures) so per-joint localisation is
    learnable from geometry AND intensity.
    """
    pts = []
    for a, b in SKELETON_EDGES:
        t = rng.random(points_per_bone)[:, None]
        seg = pose[a][None] * (1 - t) + pose[b][None] * t
        seg = seg + rng.normal(scale=0.03, size=seg.shape)
        # intensity interpolates the two joints' identity levels
        lvl = (0.95 - 0.04 * a) * (1 - t[:, 0]) + (0.95 - 0.04 * b) * t[:, 0]
        pts.append(np.concatenate([seg, lvl[:, None]], 1))
    # extra returns concentrated at the joints themselves
    for j in range(15):
        n = 6
        jp = pose[j][None] + rng.normal(scale=0.02, size=(n, 3))
        lvl = np.full((n, 1), 0.95 - 0.04 * j)
        pts.append(np.concatenate([jp, lvl], 1))
    # ground plane + uniform clutter at low intensity
    g = np.stack([rng.uniform(0.5, 8.0, clutter // 2),
                  rng.uniform(-5.0, 5.0, clutter // 2),
                  np.full(clutter // 2, -0.9) + rng.normal(
                      scale=0.02, size=clutter // 2)], 1)
    u = np.stack([rng.uniform(0.5, 8.0, clutter // 2),
                  rng.uniform(-5.0, 5.0, clutter // 2),
                  rng.uniform(-0.9, 2.0, clutter // 2)], 1)
    lvl = rng.uniform(0.02, 0.12, (clutter, 1))
    pts.append(np.concatenate([np.concatenate([g, u], 0), lvl], 1))
    return np.concatenate(pts, 0).astype(np.float32)


def generate_synthetic_dataset(root: str, num_seqs: int = 2,
                               frames_per_seq: int = 8, doppler_bins: int = 32,
                               rdr_type: str = "dzyx_real", seed: int = 0,
                               full_zyx: Tuple[int, int, int] = (32, 128, 256),
                               dtype=np.float16, pelvis_range=None,
                               offset_scale=(0.25, 0.25, 0.35),
                               z_clip=(-0.9, 2.0),
                               pose_mode: str = "gaussian",
                               test_frames_per_seq: int = None,
                               with_lidar: bool = False,
                               radar_cubes: bool = True,
                               persons_per_frame: int = 1,
                               seq_offset: int = 0,
                               roi_only: bool = False) -> Dict[str, list]:
    """Create the dataset under ``root``; returns {split: [sample keys]}.

    ``with_lidar=True`` additionally writes per-frame LiDAR point clouds
    (``<seq>/os2-64/<frame>.npy`` (N, 4) xyz+intensity, radar frame —
    P_L2R = I) and records ``Lidar_frameID`` in the labels; the reference's
    LiDAR branch consumes these through Preprocess + Voxelization
    (``det3d/datasets/pipelines/pose.py:15-142``).  ``radar_cubes=False``
    skips writing the (large) radar cubes for LiDAR-only datasets.

    ``roi_only=True`` writes each cube PRE-CROPPED to the ROI1 region
    (~6x less disk: 10.5 MB vs 67 MB per f16 Doppler frame).  The signal
    content inside the ROI is byte-identical to a full-cube root with the
    same seed; pair with ``DIR.CUBES_ARE_ROI=True`` in the dataset config
    (see :func:`dataset_cfg`) so the loader skips the index crop."""
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

    roi_slice = None
    if roi_only:
        # the loader's exact nearest-index crop (CubeGeometry.from_roi)
        from .cruw_pose import CubeGeometry
        z0, z1, y0, y1, x0, x1 = CubeGeometry.from_roi(
            {k: list(v) for k, v in ROI1.items()}).roi_idx
        roi_slice = (slice(z0, z1 + 1), slice(y0, y1 + 1), slice(x0, x1 + 1))

    meta_lines = []
    splits = {"Train": {}, "Test": {}}
    keys = {"Train": [], "Test": []}
    # seq_offset shifts seq ids/names so two generated roots can be
    # concatenated without key collisions (ConcatDataset configs write
    # per-seq eval JSONs keyed by seq name)
    for s in range(seq_offset, seq_offset + num_seqs):
        seq_id = str(s)
        seq_name = f"2024_0101_{1000 + s}"
        meta_lines.append(f"{seq_id},{seq_name}")
        cube_dir = os.path.join(root, seq_name, rdr_dir)
        os.makedirs(cube_dir, exist_ok=True)
        if with_lidar:
            lidar_dir = os.path.join(root, seq_name, "os2-64")
            os.makedirs(lidar_dir, exist_ok=True)
        frame_counter = 0
        for split in ("Train", "Test"):
            splits[split].setdefault(seq_id, {})
            n_frames = (frames_per_seq if split == "Train" or
                        test_frames_per_seq is None else test_frames_per_seq)
            for fi in range(n_frames):
                frame = f"{split.lower()}_{fi:04d}"
                rdr_frame = f"{frame_counter:06d}"
                frame_counter += 1
                # persons_per_frame > 1: pelvis centers kept >= 1.2 m
                # apart so assignment/decode see separable objects
                poses = []
                for _ in range(64):
                    cand = _random_pose(rng, pelvis_range, offset_scale,
                                        z_clip, pose_mode=pose_mode)
                    if all(np.linalg.norm(cand[0, :2] - q[0, :2]) >= 1.2
                           for q in poses):
                        poses.append(cand)
                    if len(poses) == persons_per_frame:
                        break
                pose = poses[0]
                if with_lidar:
                    np.save(os.path.join(lidar_dir, f"{rdr_frame}.npy"),
                            np.concatenate([_pose_point_cloud(rng, q)
                                            for q in poses], 0))
                if not radar_cubes:
                    splits[split][seq_id][frame] = [{
                        "Radar_frameID": rdr_frame,
                        "Lidar_frameID": rdr_frame,
                        "pose": q.tolist(),
                    } for q in poses]
                    keys[split].append(f"{seq_id}/{frame}/{rdr_frame}")
                    continue

                cube = rng.uniform(n0, n0 + 0.1 * (n1 - n0),
                                   size=(Z, Y, X)).astype(np.float32)
                # continuous fractional voxel coords (sub-voxel position)
                all_pose = np.concatenate(poses, 0)       # (P*15, 3)
                fz = (all_pose[:, 2] - arr_z[0]) / (11.6 / 32)
                fy = (all_pose[:, 1] - arr_y[0]) / (20.1 / 128)
                fx = (all_pose[:, 0] - arr_x[0]) / (11.6 / 256)
                zi = np.clip(np.round(fz).astype(int), 1, Z - 2)
                yi = np.clip(np.round(fy).astype(int), 1, Y - 2)
                xi = np.clip(np.round(fx).astype(int), 1, X - 2)
                for j in range(15 * len(poses)):
                    # deterministic per-joint intensity level: gives joints an
                    # identity signature so keypoint regression is learnable
                    # from synthetic data (real radar encodes identity via
                    # Doppler/reflectivity structure).  The pelvis/torso is
                    # the BRIGHTEST (largest radar cross-section in reality),
                    # which also makes the center heatmap's argmax target
                    # consistent with the intensity argmax.
                    level = 0.95 - 0.04 * (j % 15) - 0.05 * rng.random()
                    # gaussian splat centered at the CONTINUOUS position, so
                    # blob intensity gradients encode the sub-voxel offset
                    # the regression head must recover
                    zz, yy, xx2 = np.meshgrid(
                        np.arange(zi[j] - 1, zi[j] + 2),
                        np.arange(yi[j] - 1, yi[j] + 2),
                        np.arange(xi[j] - 1, xi[j] + 2), indexing="ij")
                    d2 = ((zz - fz[j]) ** 2 + (yy - fy[j]) ** 2
                          + (xx2 - fx[j]) ** 2)
                    blob = n0 + level * (n1 - n0) * np.exp(-d2 / (2 * 0.6 ** 2))
                    win = cube[zi[j]-1:zi[j]+2, yi[j]-1:yi[j]+2, xi[j]-1:xi[j]+2]
                    np.maximum(win, blob, out=win)
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
                if roi_slice is not None:
                    full = full[(Ellipsis,) + roi_slice]
                np.save(os.path.join(cube_dir, f"{rdr_frame}.npy"),
                        np.ascontiguousarray(full.astype(dtype)))

                objs = []
                for q in poses:
                    obj = {"Radar_frameID": rdr_frame, "pose": q.tolist()}
                    if with_lidar:
                        obj["Lidar_frameID"] = rdr_frame
                    objs.append(obj)
                splits[split][seq_id][frame] = objs
                keys[split].append(f"{seq_id}/{frame}/{rdr_frame}")

    with open(os.path.join(root, "file_meta.txt"), "w") as f:
        f.write("\n".join(meta_lines) + "\n")
    for split in ("Train", "Test"):
        with open(os.path.join(root, f"{split}.json"), "w") as f:
            json.dump(splits[split], f)
    return keys


def dataset_cfg(root: str, rdr_type: str = "dzyx_real",
                roi_only: bool = False) -> dict:
    """A DATASET config dict (reference schema) pointing at ``root``;
    ``roi_only`` for roots generated with ``roi_only=True``."""
    with_doppler = "d" in rdr_type
    return dict(
        DIR=dict(ROOT_DIR=root, META_FILE="file_meta.txt",
                 CUBES_ARE_ROI=bool(roi_only)),
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
