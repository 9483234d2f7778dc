"""Box-geometry parity vs the reference box_np_ops / geometry originals
(det3d/core/bbox/box_np_ops.py:15-803, geometry.py:6-457).

The numba originals run as plain Python here (ref_shim no-op jit), which is
slow but bit-identical — inputs are kept small.
"""

import numpy as np
import pytest

from ref_shim import import_reference

import_reference()

from det3d.core.bbox import box_np_ops as ref_ops  # noqa: E402
from det3d.core.bbox import geometry as ref_geo  # noqa: E402

from rtpose_tpu.core import boxes as ours  # noqa: E402

RNG = np.random.default_rng(0)


def rand_boxes7(n, seed=0):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-10, 10, size=(n, 3))
    dims = rng.uniform(0.5, 4.0, size=(n, 3))
    yaw = rng.uniform(-np.pi, np.pi, size=(n, 1))
    return np.concatenate([xyz, dims, yaw], axis=1)


class TestCorners:
    def test_corners_nd(self):
        for ndim, seed in [(2, 0), (3, 1)]:
            dims = np.random.default_rng(seed).uniform(0.5, 3, size=(5, ndim))
            np.testing.assert_allclose(ours.corners_nd(dims),
                                       ref_ops.corners_nd(dims))
            np.testing.assert_allclose(ours.corners_nd(dims, origin=0.0),
                                       ref_ops.corners_nd(dims, origin=0.0))

    def test_center_to_corner_box2d_3d(self):
        b = rand_boxes7(6)
        np.testing.assert_allclose(
            ours.center_to_corner_box2d(b[:, :2], b[:, 3:5], b[:, 6]),
            ref_ops.center_to_corner_box2d(b[:, :2], b[:, 3:5], b[:, 6]),
            rtol=1e-12)
        for axis in (0, 1, 2):
            np.testing.assert_allclose(
                ours.center_to_corner_box3d(b[:, :3], b[:, 3:6], b[:, 6],
                                            origin=(0.5, 1.0, 0.5), axis=axis),
                ref_ops.center_to_corner_box3d(b[:, :3], b[:, 3:6], b[:, 6],
                                               origin=(0.5, 1.0, 0.5), axis=axis),
                rtol=1e-12)

    def test_standup_and_minmax(self):
        b = rand_boxes7(6, seed=2)
        corners = ref_ops.center_to_corner_box2d(b[:, :2], b[:, 3:5], b[:, 6])
        np.testing.assert_allclose(ours.corner_to_standup_nd(corners),
                                   ref_ops.corner_to_standup_nd(corners))
        mm = ours.corner_to_standup_nd(corners)
        np.testing.assert_allclose(ours.minmax_to_corner_2d(mm),
                                   ref_ops.minmax_to_corner_2d(mm))
        np.testing.assert_allclose(
            ours.center_to_minmax_2d(b[:, :2], b[:, 3:5]),
            ref_ops.center_to_minmax_2d(b[:, :2], b[:, 3:5]))

    def test_rbbox2d_to_near_bbox(self):
        b = rand_boxes7(8, seed=3)
        rb = np.concatenate([b[:, :2], b[:, 3:5], b[:, 6:7]], axis=1)
        np.testing.assert_allclose(ours.rbbox2d_to_near_bbox(rb),
                                   ref_ops.rbbox2d_to_near_bbox(rb))


class TestRotations:
    def test_rotation_3d_in_axis(self):
        pts = RNG.normal(size=(4, 8, 3))
        ang = RNG.uniform(-np.pi, np.pi, size=4)
        for axis in (0, 1, 2):
            np.testing.assert_allclose(
                ours.rotation_3d_in_axis(pts, ang, axis),
                ref_ops.rotation_3d_in_axis(pts, ang, axis), rtol=1e-12)

    def test_rotation_points_single_angle(self):
        pts = RNG.normal(size=(10, 3))
        for axis in (0, 1, 2):
            np.testing.assert_allclose(
                ours.rotation_points_single_angle(pts, 0.7, axis),
                ref_ops.rotation_points_single_angle(pts, 0.7, axis),
                rtol=1e-12)


class TestIoU:
    def test_iou_jit(self):
        rng = np.random.default_rng(4)
        a = np.sort(rng.uniform(0, 20, size=(6, 2, 2)), axis=1).reshape(6, 4)[:, [0, 2, 1, 3]]
        b = np.sort(rng.uniform(0, 20, size=(5, 2, 2)), axis=1).reshape(5, 4)[:, [0, 2, 1, 3]]
        for eps in (1.0, 0.0):
            np.testing.assert_allclose(ours.iou_jit(a, b, eps),
                                       ref_ops.iou_jit(a, b, eps), rtol=1e-12)

    def test_iou_3d_jit(self):
        rng = np.random.default_rng(5)
        lo = rng.uniform(0, 10, size=(6, 3))
        hi = lo + rng.uniform(0.5, 5, size=(6, 3))
        a = np.concatenate([lo, hi], axis=1)
        lo = rng.uniform(0, 10, size=(4, 3))
        hi = lo + rng.uniform(0.5, 5, size=(4, 3))
        b = np.concatenate([lo, hi], axis=1)
        for add1 in (True, False):
            np.testing.assert_allclose(ours.iou_3d_jit(a, b, add1),
                                       ref_ops.iou_3d_jit(a, b, add1),
                                       rtol=1e-12)


KITTI_P2 = np.array([[721.5377, 0.0, 609.5593, 44.85728],
                     [0.0, 721.5377, 172.854, 0.2163791],
                     [0.0, 0.0, 1.0, 0.002745884],
                     [0.0, 0.0, 0.0, 1.0]])
KITTI_RECT = np.array([[0.9999239, 0.00983776, -0.00744505, 0.0],
                       [-0.0098698, 0.9999421, -0.00427846, 0.0],
                       [0.00740253, 0.00435161, 0.9999631, 0.0],
                       [0.0, 0.0, 0.0, 1.0]])
KITTI_V2C = np.array([[7.533745e-03, -9.999714e-01, -6.166020e-04, -4.069766e-03],
                      [1.480249e-02, 7.280733e-04, -9.998902e-01, -7.631618e-02],
                      [9.998621e-01, 7.523790e-03, 1.480755e-02, -2.717806e-01],
                      [0.0, 0.0, 0.0, 1.0]])


class TestCameraPipeline:
    def test_projection_matrix_to_CRT(self):
        for o, r in zip(ours.projection_matrix_to_CRT_kitti(KITTI_P2),
                        ref_ops.projection_matrix_to_CRT_kitti(KITTI_P2)):
            np.testing.assert_allclose(o, r, rtol=1e-10)

    def test_get_frustum(self):
        C, R, T = ref_ops.projection_matrix_to_CRT_kitti(KITTI_P2)
        bbox = [0, 0, 1242, 375]
        np.testing.assert_allclose(ours.get_frustum(bbox, C),
                                   ref_ops.get_frustum(bbox, C), rtol=1e-10)

    def test_project_to_image(self):
        pts = RNG.uniform([-10, -2, 5], [10, 2, 60], size=(30, 3))
        np.testing.assert_allclose(ours.project_to_image(pts, KITTI_P2),
                                   ref_ops.project_to_image(pts, KITTI_P2),
                                   rtol=1e-10)

    def test_camera_lidar_roundtrip_and_boxes(self):
        pts = RNG.uniform([-10, -2, 5], [10, 2, 60], size=(20, 3))
        np.testing.assert_allclose(
            ours.camera_to_lidar_np(pts, KITTI_RECT, KITTI_V2C),
            ref_ops.camera_to_lidar(pts, KITTI_RECT, KITTI_V2C), rtol=1e-10)
        np.testing.assert_allclose(
            ours.lidar_to_camera_np(pts, KITTI_RECT, KITTI_V2C),
            ref_ops.lidar_to_camera(pts, KITTI_RECT, KITTI_V2C), rtol=1e-10)
        boxes_cam = np.concatenate(
            [pts[:5], RNG.uniform(1, 4, size=(5, 3)),
             RNG.uniform(-np.pi, np.pi, size=(5, 1))], axis=1)
        np.testing.assert_allclose(
            ours.box_camera_to_lidar(boxes_cam, KITTI_RECT, KITTI_V2C),
            ref_ops.box_camera_to_lidar(boxes_cam, KITTI_RECT, KITTI_V2C),
            rtol=1e-10)
        boxes_lidar = ref_ops.box_camera_to_lidar(boxes_cam, KITTI_RECT, KITTI_V2C)
        np.testing.assert_allclose(
            ours.box_lidar_to_camera(boxes_lidar, KITTI_RECT, KITTI_V2C),
            ref_ops.box_lidar_to_camera(boxes_lidar, KITTI_RECT, KITTI_V2C),
            rtol=1e-10)

    def test_remove_outside_points(self):
        pts = np.concatenate(
            [RNG.uniform([-5, -40, -3], [80, 40, 3], size=(300, 3)),
             RNG.uniform(size=(300, 1))], axis=1)
        got = ours.remove_outside_points(pts, KITTI_RECT, KITTI_V2C, KITTI_P2,
                                         (375, 1242))
        want = ref_ops.remove_outside_points(pts, KITTI_RECT, KITTI_V2C,
                                             KITTI_P2, (375, 1242))
        np.testing.assert_allclose(got, want)


class TestPolygonTests:
    def test_surfaces_and_points_in_convex_polygon_3d(self):
        b = rand_boxes7(4, seed=6)
        corners = ref_ops.center_to_corner_box3d(b[:, :3], b[:, 3:6], b[:, 6])
        np.testing.assert_allclose(ours.corner_to_surfaces_3d(corners),
                                   ref_ops.corner_to_surfaces_3d(corners))
        surfaces = ref_ops.corner_to_surfaces_3d(corners)
        nv_o, d_o = ours.surface_equ_3d(surfaces[:, :, :3, :])
        nv_r, d_r = ref_geo.surface_equ_3d(surfaces[:, :, :3, :])
        np.testing.assert_allclose(nv_o, nv_r)
        np.testing.assert_allclose(d_o, d_r)

        pts = RNG.uniform(-12, 12, size=(200, 3))
        np.testing.assert_array_equal(
            ours.points_in_convex_polygon_3d(pts, surfaces),
            ref_geo.points_in_convex_polygon_3d_jit(pts, surfaces))

    def test_points_in_convex_polygon_2d(self):
        b = rand_boxes7(3, seed=7)
        poly = ref_ops.center_to_corner_box2d(b[:, :2], b[:, 3:5], b[:, 6])
        pts = RNG.uniform(-12, 12, size=(100, 2))
        np.testing.assert_array_equal(
            ours.points_in_convex_polygon(pts, poly),
            ref_geo.points_in_convex_polygon(pts, poly))

    def test_points_in_rbbox(self):
        b = rand_boxes7(3, seed=8)
        pts = RNG.uniform(-12, 12, size=(150, 4))
        np.testing.assert_array_equal(ours.points_in_rbbox(pts, b),
                                      ref_ops.points_in_rbbox(pts, b))

    def test_change_box3d_center(self):
        b = rand_boxes7(5, seed=9)
        ref_b = b.copy()
        ref_ops.change_box3d_center_(ref_b, (0.5, 0.5, 0), (0.5, 0.5, 0.5))
        np.testing.assert_allclose(
            ours.change_box3d_center(b, (0.5, 0.5, 0), (0.5, 0.5, 0.5)), ref_b)
