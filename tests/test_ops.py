"""Tests for TPU-native op equivalents: voxelization, circle NMS,
rotated IoU / NMS."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rtpose_tpu.ops.voxelize import (VoxelizerSpec, voxelize,
                                     dynamic_scatter_mean, scatter_to_dense)
from rtpose_tpu.ops.nms import (circle_nms, box_corners_bev, boxes_overlap_bev,
                                boxes_iou_bev, boxes_iou3d, rotate_nms)


SPEC = VoxelizerSpec(pc_range=(0, -2, -1, 4, 2, 1), voxel_size=(0.5, 0.5, 0.5),
                     max_points=4, max_voxels=16)


def ref_voxelize(points, spec):
    """Independent numpy replica of the reference hash-grid semantics."""
    nx, ny, nz = spec.grid_size_xyz
    coor_map = {}
    voxels = np.zeros((spec.max_voxels, spec.max_points, points.shape[1]), np.float32)
    coors = np.zeros((spec.max_voxels, 3), np.int32)
    npts = np.zeros((spec.max_voxels,), np.int32)
    nv = 0
    for p in points:
        c = np.floor((p[:3] - np.array(spec.pc_range[:3])) / np.array(spec.voxel_size)).astype(int)
        if np.any(c < 0) or c[0] >= nx or c[1] >= ny or c[2] >= nz:
            continue
        key = (c[2], c[1], c[0])
        if key not in coor_map:
            if nv >= spec.max_voxels:
                continue
            coor_map[key] = nv
            coors[nv] = key
            nv += 1
        vi = coor_map[key]
        if npts[vi] < spec.max_points:
            voxels[vi, npts[vi]] = p
            npts[vi] += 1
    return voxels, coors, npts, nv


class TestVoxelize:
    def test_matches_reference_semantics_as_sets(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform([-1, -3, -2, 0], [5, 3, 2, 1], size=(64, 4)).astype(np.float32)
        out = jax.jit(lambda p, n: voxelize(p, n, SPEC))(jnp.asarray(pts), jnp.int32(64))
        rv, rc, rn, rnum = ref_voxelize(pts, SPEC)

        assert int(out["num_voxels"]) == rnum
        # same voxel coordinate set
        got = {tuple(c) for c, n in zip(np.asarray(out["coors"]),
                                        np.asarray(out["num_points_per_voxel"])) if n > 0}
        want = {tuple(c) for c, n in zip(rc, rn) if n > 0}
        assert got == want
        # per-voxel point MEANS equal when no voxel overflows (order-invariant)
        gm = {}
        for c, v, n in zip(np.asarray(out["coors"]),
                           np.asarray(out["voxels"]),
                           np.asarray(out["num_points_per_voxel"])):
            if n > 0:
                gm[tuple(c)] = v[:n].mean(0)
        for c, v, n in zip(rc, rv, rn):
            if n > 0 and n < SPEC.max_points:  # not overflowed
                np.testing.assert_allclose(gm[tuple(c)], v[:n].mean(0), rtol=1e-5)

    def test_out_of_range_and_padding_dropped(self):
        pts = np.array([[10.0, 0, 0, 1], [1.0, 0, 0, 2], [0.5, 0, 0, 3]], np.float32)
        out = voxelize(jnp.asarray(pts), jnp.int32(2), SPEC)  # 3rd is padding
        assert int(out["num_voxels"]) == 1  # only point 2 valid
        assert int(out["num_points_per_voxel"].sum()) == 1

    def test_max_points_cap(self):
        pts = np.tile(np.array([[1.1, 0.1, 0.1, 7.0]], np.float32), (10, 1))
        out = voxelize(jnp.asarray(pts), jnp.int32(10), SPEC)
        assert int(out["num_voxels"]) == 1
        assert int(out["num_points_per_voxel"][0]) == SPEC.max_points

    def test_scatter_to_dense(self):
        vf = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
        coors = jnp.asarray([[0, 1, 2], [1, 0, 0]], jnp.int32)
        grid = scatter_to_dense(vf, coors, jnp.int32(2), (2, 2, 3))
        assert grid.shape == (2, 2, 3, 2)
        np.testing.assert_allclose(np.asarray(grid[0, 1, 2]), [1, 2])
        np.testing.assert_allclose(np.asarray(grid[1, 0, 0]), [3, 4])
        assert float(jnp.abs(grid).sum()) == 10.0

    def test_dynamic_scatter_mean(self):
        pts = np.array([[0.1, -1.9, -0.9, 2.0],
                        [0.2, -1.8, -0.8, 4.0],     # same voxel (0,0,0)
                        [3.9, 1.9, 0.9, 8.0]], np.float32)
        grid = dynamic_scatter_mean(jnp.asarray(pts), jnp.int32(3), SPEC)
        nz, ny, nx = SPEC.grid_size_zyx
        assert grid.shape == (nz, ny, nx, 4)
        np.testing.assert_allclose(np.asarray(grid[0, 0, 0]),
                                   [0.15, -1.85, -0.85, 3.0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(grid[-1, -1, -1])[3], 8.0)


class TestCircleNMS:
    def ref_circle_nms(self, dets, thresh):
        x1, y1, scores = dets[:, 0], dets[:, 1], dets[:, 2]
        order = scores.argsort()[::-1]
        suppressed = np.zeros(len(dets), bool)
        keep = []
        for _i in range(len(dets)):
            i = order[_i]
            if suppressed[i]:
                continue
            keep.append(i)
            for _j in range(_i + 1, len(dets)):
                j = order[_j]
                if suppressed[j]:
                    continue
                if (x1[i] - x1[j]) ** 2 + (y1[i] - y1[j]) ** 2 <= thresh:
                    suppressed[j] = True
        return keep

    def test_matches_reference(self):
        rng = np.random.default_rng(1)
        dets = np.stack([rng.uniform(0, 10, 40), rng.uniform(0, 10, 40),
                         rng.random(40)], axis=1).astype(np.float32)
        keep, num = jax.jit(lambda d: circle_nms(d, 2.0, post_max_size=40))(
            jnp.asarray(dets))
        ref = self.ref_circle_nms(dets, 2.0)
        got = np.asarray(keep)[: int(num)].tolist()
        assert got == ref


class TestRotatedIoU:
    def test_identical_boxes(self):
        b = jnp.asarray([[0, 0, 0, 2, 4, 2, 0.7]])
        iou = boxes_iou_bev(b, b)
        assert float(iou[0, 0]) == pytest.approx(1.0, abs=1e-5)

    def test_axis_aligned_known_overlap(self):
        a = jnp.asarray([[0.0, 0, 0, 2, 2, 2, 0]])
        b = jnp.asarray([[1.0, 0, 0, 2, 2, 2, 0]])
        inter = boxes_overlap_bev(a, b)
        assert float(inter[0, 0]) == pytest.approx(2.0, abs=1e-5)  # 1x2
        iou = boxes_iou_bev(a, b)
        assert float(iou[0, 0]) == pytest.approx(2.0 / 6.0, abs=1e-5)

    def test_rotated_45_cross(self):
        # unit square vs same square rotated 45deg: known IoU
        a = jnp.asarray([[0.0, 0, 0, 1, 1, 1, 0]])
        b = jnp.asarray([[0.0, 0, 0, 1, 1, 1, np.pi / 4]])
        inter = float(boxes_overlap_bev(a, b)[0, 0])
        # octagon area = 2*(sqrt(2)-1) ~ 0.8284
        assert inter == pytest.approx(2 * (np.sqrt(2) - 1), abs=1e-4)

    def test_disjoint(self):
        a = jnp.asarray([[0.0, 0, 0, 1, 1, 1, 0.3]])
        b = jnp.asarray([[5.0, 5, 0, 1, 1, 1, 1.0]])
        assert float(boxes_overlap_bev(a, b)[0, 0]) == 0.0

    def test_iou3d_z_extent(self):
        a = jnp.asarray([[0.0, 0, 0.0, 2, 2, 2, 0]])
        b = jnp.asarray([[0.0, 0, 1.0, 2, 2, 2, 0]])  # half z-overlap
        iou = float(boxes_iou3d(a, b)[0, 0])
        # inter = 4 (bev) * 1 (z) = 4; union = 8+8-4 = 12
        assert iou == pytest.approx(4 / 12, abs=1e-5)

    def test_rotate_nms(self):
        boxes = jnp.asarray([
            [0.0, 0, 0, 2, 2, 2, 0],
            [0.1, 0, 0, 2, 2, 2, 0.05],   # heavy overlap with #0
            [5.0, 5, 0, 2, 2, 2, 0.4],
        ])
        scores = jnp.asarray([0.9, 0.8, 0.7])
        keep, num = rotate_nms(boxes, scores, thresh=0.3, post_max_size=3)
        assert int(num) == 2
        assert np.asarray(keep)[:2].tolist() == [0, 2]
