"""GT-database augmentation + LR schedule family tests."""

import numpy as np
import pytest

from rtpose_tpu.data.gt_sampler import (create_gt_database, DataBaseSampler,
                                        points_in_box_np)
from rtpose_tpu.solver.schedules import (fixed_lr, step_lr, exp_lr, poly_lr,
                                         inv_lr, cosine_lr, with_warmup,
                                         manual_stepping)


class TestGTSampler:
    def _scene(self, rng, centers):
        boxes = np.array([[c[0], c[1], 0.0, 1.0, 1.0, 2.0, 0.0] for c in centers],
                         np.float32)
        pts = []
        for b in boxes:
            pts.append(b[:3] + rng.normal(scale=0.2, size=(20, 3)).clip(-0.45, 0.45))
        pts.append(rng.uniform(-10, 10, size=(50, 3)))
        points = np.concatenate(pts).astype(np.float32)
        return points, boxes

    def test_create_and_paste(self):
        rng = np.random.default_rng(0)
        points, boxes = self._scene(rng, [(0, 0), (5, 5)])
        db = create_gt_database([dict(points=points, gt_boxes=boxes,
                                      gt_names=["ped", "ped"])])
        assert len(db["ped"]) == 2
        # every stored cluster is object-local (centered)
        for obj in db["ped"]:
            assert np.abs(obj["points"][:, :2]).max() <= 0.75

        sampler = DataBaseSampler(db, {"ped": 4}, rng=np.random.default_rng(1))
        scene_pts, scene_boxes = self._scene(rng, [(-5, -5)])
        p2, b2, n2 = sampler.sample_all(scene_pts, scene_boxes, ["ped"])
        assert len(b2) >= len(scene_boxes)
        assert len(n2) == len(b2)
        assert len(p2) >= len(scene_pts)

    def test_collision_rejected(self):
        rng = np.random.default_rng(0)
        points, boxes = self._scene(rng, [(0, 0)])
        db = create_gt_database([dict(points=points, gt_boxes=boxes,
                                      gt_names=["ped"])])
        # scene already has a box exactly where the db object sits -> reject
        sampler = DataBaseSampler(db, {"ped": 5}, rng=np.random.default_rng(2))
        p2, b2, n2 = sampler.sample_all(points, boxes, ["ped"])
        assert len(b2) == 1  # nothing pasted


class TestSchedules:
    def test_step(self):
        fn = step_lr(1.0, [10, 20], gamma=0.1)
        assert float(fn(5)) == pytest.approx(1.0)
        assert float(fn(15)) == pytest.approx(0.1)
        assert float(fn(25)) == pytest.approx(0.01)

    def test_poly_and_cosine_endpoints(self):
        fn = poly_lr(1.0, 100)
        assert float(fn(0)) == pytest.approx(1.0)
        assert float(fn(100)) == pytest.approx(0.0, abs=1e-7)
        fc = cosine_lr(1.0, 100, target_ratio=0.1)
        assert float(fc(0)) == pytest.approx(1.0)
        assert float(fc(100)) == pytest.approx(0.1, abs=1e-6)

    def test_exp_inv_fixed(self):
        assert float(exp_lr(2.0, 0.5)(2)) == pytest.approx(0.5)
        assert float(fixed_lr(0.3)(1000)) == pytest.approx(0.3)
        assert float(inv_lr(1.0, 1.0, 1.0)(1)) == pytest.approx(0.5)

    def test_warmup_linear(self):
        fn = with_warmup(fixed_lr(1.0), "linear", warmup_iters=10,
                         warmup_ratio=0.1)
        assert float(fn(0)) == pytest.approx(0.1)
        assert float(fn(10)) == pytest.approx(1.0)
        assert float(fn(5)) < 1.0

    def test_manual_stepping(self):
        fn = manual_stepping(100, [0.5, 0.8], [1.0, 0.1, 0.01])
        assert float(fn(10)) == pytest.approx(1.0)
        assert float(fn(60)) == pytest.approx(0.1)
        assert float(fn(90)) == pytest.approx(0.01)


class TestAugment:
    def test_global_rotation_consistency(self):
        from rtpose_tpu.data.augment import global_rotation
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(50, 4)).astype(np.float32)
        boxes = np.array([[1, 2, 0, 1, 1, 1, 0.1]], np.float32)
        p2, b2, noise = global_rotation(pts, boxes, rng=np.random.default_rng(1))
        # norms preserved, yaw shifted by the same noise
        np.testing.assert_allclose(np.linalg.norm(p2[:, :3], axis=1),
                                   np.linalg.norm(pts[:, :3], axis=1), rtol=1e-5)
        assert b2[0, 6] == pytest.approx(0.1 + noise, abs=1e-6)

    def test_global_scaling_and_translate(self):
        from rtpose_tpu.data.augment import global_scaling, global_translate
        pts = np.ones((5, 3), np.float32)
        boxes = np.array([[1, 1, 1, 2, 2, 2, 0.0]], np.float32)
        p2, b2, s = global_scaling(pts, boxes, rng=np.random.default_rng(0))
        np.testing.assert_allclose(p2, s, rtol=1e-6)
        np.testing.assert_allclose(b2[0, 3:6], 2 * s, rtol=1e-6)
        p3, b3, t = global_translate(pts, boxes, rng=np.random.default_rng(0))
        np.testing.assert_allclose(p3, np.tile(1 + t, (5, 1)), rtol=1e-5)

    def test_flip_pose_swaps_lr(self):
        from rtpose_tpu.data.augment import flip_pose_y
        pose = np.zeros((15, 3), np.float32)
        pose[1] = [1, 2, 3]   # R hip
        pose[4] = [4, 5, 6]   # L hip
        out = flip_pose_y(pose)
        np.testing.assert_allclose(out[4], [1, -2, 3])
        np.testing.assert_allclose(out[1], [4, -5, 6])

    def test_noise_per_object_moves_points_with_box(self):
        from rtpose_tpu.data.augment import noise_per_object
        rng = np.random.default_rng(0)
        boxes = np.array([[0, 0, 0, 2, 2, 2, 0.0]], np.float32)
        pts = rng.uniform(-0.9, 0.9, size=(30, 3)).astype(np.float32)
        b2, p2 = noise_per_object(boxes, pts, rng=np.random.default_rng(3))
        # points stay inside the moved box
        from rtpose_tpu.data.gt_sampler import points_in_box_np
        assert points_in_box_np(p2, b2[0]).mean() > 0.95
