"""Golden tests pinning the target-assignment / decode / loss math.

Coordinate conventions are verified against hand-computed values (SURVEY.md
§7 'hard parts': zyx vs xyz ordering must be pinned by tests, not by copying
reference code).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rtpose_tpu.core.gaussian import (
    gaussian_radius, gaussian3d, draw_gaussian3d, dense_pose_heatmap,
)
from rtpose_tpu.core.targets import (
    PoseTargetSpec, assign_pose_targets_np, assign_pose_targets,
)
from rtpose_tpu.core.decode import DecodeSpec, decode_pose_preds, post_process_pose
from rtpose_tpu.core.metrics import pjpe, abs_pjpe
from rtpose_tpu.models.losses import fast_focal_loss, reg_loss, clamped_sigmoid

# The flagship (hr3d_one_hm_doppler) geometry.
GRID = (16, 64, 160)  # (Z, Y, X)
ROI_MIN = (0.7703125, -5.0250000000000234, -1.0875000000000021)  # (x, y, z)
VOXEL = (0.0453125, 0.15703125, 0.3625)  # (sx, sy, sz)

SPEC = PoseTargetSpec(
    grid_zyx=GRID, pc_range_min_xyz=ROI_MIN, voxel_size_xyz=VOXEL,
    max_poses=1, min_radius=2, mode="one_hm", num_classes=1,
)
DSPEC = DecodeSpec(grid_zyx=GRID, pc_range_min_xyz=ROI_MIN, voxel_size_xyz=VOXEL)


def make_pose(rng, margin=3):
    """A random 15-joint pose whose pelvis is safely inside the grid."""
    vox = np.stack([
        rng.uniform(margin, GRID[2] - margin, 15),  # x voxels
        rng.uniform(margin, GRID[1] - margin, 15),  # y voxels
        rng.uniform(margin, GRID[0] - margin, 15),  # z voxels
    ], axis=-1)
    world = vox * np.array(VOXEL) + np.array(ROI_MIN)
    return world.astype(np.float32)


class TestGaussian:
    def test_gaussian3d_center_is_one(self):
        g = gaussian3d((5, 5, 5), sigma=5 / 6)
        assert g[2, 2, 2] == pytest.approx(1.0)

    def test_gaussian3d_reference_normalization(self):
        # value at unit offset: exp(-1 / (2*sigma^2)^1.5)
        sigma = 5 / 6
        g = gaussian3d((5, 5, 5), sigma=sigma)
        expect = np.exp(-1.0 / (2 * sigma * sigma) ** 1.5)
        assert g[2, 2, 3] == pytest.approx(expect, rel=1e-6)

    def test_draw_clips_at_boundary(self):
        hm = np.zeros(GRID, np.float32)
        draw_gaussian3d(hm, (0, 0, 0), radius=2)  # corner (x=0,y=0,z=0)
        assert hm[0, 0, 0] == pytest.approx(1.0)
        assert hm.max() == pytest.approx(1.0)
        # nothing written outside the 3x3x3 visible window
        assert hm[3:, :, :].max() == 0 and hm[:, 3:, :].max() == 0 and hm[:, :, 3:].max() == 0

    def test_draw_max_merge(self):
        hm = np.zeros(GRID, np.float32)
        draw_gaussian3d(hm, (10, 10, 8), radius=2)
        before = hm[8, 10, 10]
        draw_gaussian3d(hm, (12, 10, 8), radius=2)
        assert hm[8, 10, 10] == pytest.approx(max(before, hm[8, 10, 12] * gaussian3d((5,) * 3, 5 / 6)[2, 2, 0]), abs=1e-6) or hm[8, 10, 10] >= before

    def test_dense_matches_splat(self):
        rng = np.random.default_rng(0)
        centers_xyz = np.array([[5, 10, 3], [150, 60, 14], [0, 0, 0], [80, 32, 8]], np.int32)
        hm_np = np.zeros(GRID, np.float32)
        for c in centers_xyz:
            draw_gaussian3d(hm_np, c, radius=2)
        hm_j = dense_pose_heatmap(jnp.asarray(centers_xyz[:, ::-1]),
                                  jnp.ones(4, bool), GRID, radius=2)
        np.testing.assert_allclose(np.asarray(hm_j), hm_np, atol=3e-6)

    def test_gaussian_radius_known_value(self):
        # height=width=10, overlap 0.5.  The reference keeps the classic
        # CenterNet implementation quirk of dividing every quadratic root by
        # 2 instead of 2a (center_utils.py:17-37); value pinned accordingly.
        r = gaussian_radius((10, 10), 0.5)
        assert r == pytest.approx(4.142135623, rel=1e-6)


class TestTargets:
    def test_flat_index_convention(self):
        """ind = z*(Y*X) + y*X + x — the single most bug-prone convention."""
        pose = np.zeros((1, 15, 3), np.float32)
        # put the pelvis exactly at voxel (x=7, y=5, z=3) center +0.4
        vox = np.array([7.4, 5.4, 3.4])
        pose[0, :, :] = vox * np.array(VOXEL) + np.array(ROI_MIN)
        out = assign_pose_targets_np(pose, 1, SPEC)
        Z, Y, X = GRID
        assert out["ind"][0] == 3 * Y * X + 5 * X + 7
        assert out["mask"][0] == 1
        # peak of the heatmap sits at [z, y, x]
        assert out["hm"][0, 3, 5, 7] == pytest.approx(1.0)
        # offsets are (ct - ct_int) per joint, xyz order
        np.testing.assert_allclose(out["anno_pose"][0][:3], [0.4, 0.4, 0.4], atol=1e-5)

    def test_out_of_range_pose_dropped(self):
        pose = np.zeros((1, 15, 3), np.float32)
        pose[0, :, :] = np.array([-50.0, 0.0, 0.0])  # x far outside ROI
        out = assign_pose_targets_np(pose, 1, SPEC)
        assert out["mask"].sum() == 0
        assert out["hm"].max() == 0

    def test_jnp_matches_np_one_hm(self):
        rng = np.random.default_rng(42)
        for _ in range(5):
            pose = make_pose(rng)[None]
            ref = assign_pose_targets_np(pose.copy(), 1, SPEC)
            dev = jax.jit(lambda p, n: assign_pose_targets(p, n, SPEC))(
                jnp.asarray(pose), jnp.int32(1))
            np.testing.assert_allclose(np.asarray(dev["hm"]), ref["hm"], atol=1e-5)
            np.testing.assert_array_equal(np.asarray(dev["ind"]), ref["ind"])
            np.testing.assert_array_equal(np.asarray(dev["mask"]), ref["mask"])
            np.testing.assert_allclose(np.asarray(dev["anno_pose"]), ref["anno_pose"],
                                       rtol=3e-6, atol=3e-5)

    def test_jnp_matches_np_per_joint(self):
        spec = PoseTargetSpec(grid_zyx=GRID, pc_range_min_xyz=ROI_MIN,
                              voxel_size_xyz=VOXEL, max_poses=2, min_radius=2,
                              mode="per_joint", num_classes=15)
        rng = np.random.default_rng(7)
        pose = np.stack([make_pose(rng), make_pose(rng)])[None][0]  # (2, 15, 3)
        ref = assign_pose_targets_np(pose.copy(), 2, spec)
        dev = jax.jit(lambda p, n: assign_pose_targets(p, n, spec))(
            jnp.asarray(pose), jnp.int32(2))
        np.testing.assert_allclose(np.asarray(dev["hm"]), ref["hm"], atol=1e-5)
        np.testing.assert_array_equal(np.asarray(dev["ind"]), ref["ind"])
        np.testing.assert_array_equal(np.asarray(dev["cat"]), ref["cat"])
        np.testing.assert_allclose(np.asarray(dev["anno_pose"]), ref["anno_pose"],
                                   rtol=3e-6, atol=3e-5)


class TestDecode:
    def test_roundtrip_assign_decode(self):
        """Targets assigned from a pose, fed as perfect predictions, must
        decode back to the original keypoints (up to float eps)."""
        rng = np.random.default_rng(3)
        pose = make_pose(rng)  # (15, 3) world
        t = assign_pose_targets_np(pose[None], 1, SPEC)

        Z, Y, X = GRID
        hm_logits = np.full((1, Z, Y, X, 1), -10.0, np.float32)
        zi, yi, xi = np.unravel_index(t["ind"][0], (Z, Y, X))
        hm_logits[0, zi, yi, xi, 0] = 10.0
        reg = np.zeros((1, Z, Y, X, 45), np.float32)
        reg[0, zi, yi, xi] = t["anno_pose"][0]

        kpts, scores, labels = decode_pose_preds(jnp.asarray(hm_logits),
                                                 jnp.asarray(reg), DSPEC)
        np.testing.assert_allclose(np.asarray(kpts)[0], pose, atol=1e-4)
        assert scores[0, 0] > 0.99

    def test_flat_argmax_matches_jnp_argmax(self):
        """flat_argmax (two-reduce formulation shipped for the TPU decode
        tail) must equal jnp.argmax everywhere, including first-index
        tie-breaking and negative values."""
        from rtpose_tpu.core.decode import flat_argmax
        rng = np.random.default_rng(11)
        v = rng.normal(size=(4, 257, 3)).astype(np.float32)
        # inject exact ties: duplicate each batch's max at a LATER index
        for b in range(4):
            m = v[b, :, 0].max()
            v[b, 200, 0] = m
            v[b, 220, 0] = m
        np.testing.assert_array_equal(
            np.asarray(flat_argmax(jnp.asarray(v), axis=1)),
            np.argmax(v, axis=1))
        # 2-D case (predict_sparse's (B, N) use)
        v2 = v[..., 0]
        np.testing.assert_array_equal(
            np.asarray(flat_argmax(jnp.asarray(v2), axis=1)),
            np.argmax(v2, axis=1))
        # all-equal input: index 0 everywhere
        ones = jnp.ones((2, 33))
        np.testing.assert_array_equal(np.asarray(flat_argmax(ones)), [0, 0])

    def test_post_processing_format(self):
        kpts = jnp.zeros((2, 15, 3))
        scores = jnp.full((2, 15), 0.7)
        labels = jnp.broadcast_to(jnp.arange(15), (2, 15))
        out = post_process_pose(kpts, scores, labels, DSPEC,
                                metas=[{"seq": "0"}, {"seq": "1"}])
        assert len(out) == 2
        assert len(out[0]["keypoints"]) == 15
        assert out[0]["keypoints"][3][0] == 3
        assert len(out[0]["keypoints"][0]) == 5

    def test_zero_threshold_keeps_underflowed_pelvis(self):
        """score_threshold=0.0 means NO filtering: a sigmoid score that
        underflows to exactly 0.0 (logit < ~-103, seen under badly-scaled
        int8 quantization) must still emit joint 0 — a 14-joint prediction
        crashes the fixed-15 evaluation protocol (round-5 regression on the
        quantile-calibrated int8 artifact)."""
        kpts = jnp.zeros((1, 15, 3))
        scores = jnp.full((1, 15), 0.5).at[0, 0].set(0.0)
        labels = jnp.broadcast_to(jnp.arange(15), (1, 15))
        out = post_process_pose(kpts, scores, labels, DSPEC, one_hm=True)
        assert len(out[0]["keypoints"]) == 15
        assert out[0]["keypoints"][0][0] == 0
        # a positive threshold still filters (reference semantics)
        import dataclasses
        spec_t = dataclasses.replace(DSPEC, score_threshold=0.1)
        out_t = post_process_pose(kpts, scores, labels, spec_t, one_hm=True)
        assert len(out_t[0]["keypoints"]) == 14


class TestMetrics:
    def test_abs_pjpe(self):
        pred = np.zeros((15, 3)); gt = np.zeros((15, 3))
        pred[:, 0] = 0.1
        np.testing.assert_allclose(abs_pjpe(pred, gt), 0.1)

    def test_pjpe_root_relative(self):
        rng = np.random.default_rng(0)
        gt = rng.normal(size=(15, 3))
        pred = gt + np.array([0.5, -0.2, 0.3])  # constant translation
        np.testing.assert_allclose(pjpe(pred, gt), 0.0, atol=1e-12)

    def test_pjpe_pure(self):
        pred = np.ones((15, 3)); gt = np.zeros((15, 3))
        p0 = pred.copy()
        pjpe(pred, gt)
        np.testing.assert_array_equal(pred, p0)


class TestLosses:
    def _example(self, rng, B=2, C=1, M=1, D=45):
        Z, Y, X = 4, 8, 10
        logits = jnp.asarray(rng.normal(size=(B, Z, Y, X, C)).astype(np.float32))
        target = jnp.zeros((B, Z, Y, X, C), jnp.float32)
        ind = jnp.asarray(rng.integers(0, Z * Y * X, size=(B, M)))
        zi = np.asarray(ind) // (Y * X); rem = np.asarray(ind) % (Y * X)
        tgt = np.zeros((B, Z, Y, X, C), np.float32)
        for b in range(B):
            tgt[b, zi[b, 0], rem[b, 0] // X, rem[b, 0] % X, 0] = 1.0
        target = jnp.asarray(tgt)
        mask = jnp.ones((B, M), jnp.uint8)
        cat = jnp.zeros((B, M), jnp.int32)
        regp = jnp.asarray(rng.normal(size=(B, Z, Y, X, D)).astype(np.float32))
        regt = jnp.asarray(rng.normal(size=(B, M, D)).astype(np.float32))
        return logits, target, ind, mask, cat, regp, regt

    def test_focal_matches_manual(self):
        rng = np.random.default_rng(1)
        logits, target, ind, mask, cat, _, _ = self._example(rng)
        out = clamped_sigmoid(logits)
        loss = float(fast_focal_loss(out, target, ind, mask, cat))

        # independent numpy computation
        o = np.asarray(out); t = np.asarray(target)
        neg = (np.log(1 - o) * o ** 2 * (1 - t) ** 4).sum()
        B = o.shape[0]
        of = o.reshape(B, -1, 1)
        pos = 0.0
        for b in range(B):
            p = of[b, int(ind[b, 0]), 0]
            pos += np.log(p) * (1 - p) ** 2
        expect = -(pos + neg) / 2.0
        assert loss == pytest.approx(expect, rel=1e-5)

    def test_focal_no_positives(self):
        rng = np.random.default_rng(2)
        logits, target, ind, mask, cat, _, _ = self._example(rng)
        out = clamped_sigmoid(logits)
        mask0 = jnp.zeros_like(mask)
        # with no positives target gaussians may still exist; here target has
        # peaks but mask==0 -> loss = -neg_sum per reference semantics
        loss = float(fast_focal_loss(out, target, ind, mask0, cat))
        o = np.asarray(out); t = np.asarray(target)
        neg = (np.log(1 - o) * o ** 2 * (1 - t) ** 4).sum()
        assert loss == pytest.approx(-neg, rel=1e-5)

    def test_reg_loss_matches_manual(self):
        rng = np.random.default_rng(3)
        _, _, ind, mask, _, regp, regt = self._example(rng)
        vec = np.asarray(reg_loss(regp, mask, ind, regt))
        assert vec.shape == (45,)
        B, M = ind.shape
        rp = np.asarray(regp).reshape(B, -1, 45)
        expect = np.zeros(45)
        for b in range(B):
            pred = rp[b, int(ind[b, 0])]
            expect += np.abs(pred - np.asarray(regt)[b, 0])
        expect /= (2.0 + 1e-4)
        np.testing.assert_allclose(vec, expect, rtol=1e-5)

    def test_reg_loss_masked_out(self):
        rng = np.random.default_rng(4)
        _, _, ind, mask, _, regp, regt = self._example(rng)
        vec = np.asarray(reg_loss(regp, jnp.zeros_like(mask), ind, regt))
        np.testing.assert_allclose(vec, 0.0)


class TestFocalLogits:
    def test_matches_clamped_version_in_active_region(self):
        """Where the reference clamp is inactive, the logits form must equal
        the clamped-sigmoid form exactly."""
        from rtpose_tpu.models.losses import fast_focal_loss_logits
        rng = np.random.default_rng(5)
        B, Z, Y, X, C = 2, 4, 8, 10, 1
        logits = jnp.asarray(rng.normal(scale=2.0, size=(B, Z, Y, X, C)).astype(np.float32))
        tgt = np.zeros((B, Z, Y, X, C), np.float32)
        ind = np.zeros((B, 1), np.int64)
        for b in range(B):
            i = rng.integers(0, Z * Y * X)
            ind[b, 0] = i
            zi, rem = divmod(i, Y * X)
            tgt[b, zi, rem // X, rem % X, 0] = 1.0
        mask = jnp.ones((B, 1), jnp.uint8)
        cat = jnp.zeros((B, 1), jnp.int32)
        a = float(fast_focal_loss(clamped_sigmoid(logits), jnp.asarray(tgt),
                                  jnp.asarray(ind), mask, cat))
        b = float(fast_focal_loss_logits(logits, jnp.asarray(tgt),
                                         jnp.asarray(ind), mask, cat))
        assert b == pytest.approx(a, rel=1e-4)

    def test_gradient_alive_at_saturation(self):
        """At logits far below the clamp floor the clamped form has zero
        gradient; the logits form must still push positives up."""
        from rtpose_tpu.models.losses import fast_focal_loss_logits
        B, N = 1, 16
        tgt = np.zeros((B, 1, 1, N, 1), np.float32); tgt[0, 0, 0, 3, 0] = 1.0
        ind = jnp.asarray([[3]]); mask = jnp.ones((1, 1), jnp.uint8)
        cat = jnp.zeros((1, 1), jnp.int32)
        x0 = jnp.full((B, 1, 1, N, 1), -15.0)  # sigmoid ~ 3e-7, deep below clamp

        g_clamped = jax.grad(lambda x: fast_focal_loss(
            clamped_sigmoid(x), jnp.asarray(tgt), ind, mask, cat))(x0)
        g_logits = jax.grad(lambda x: fast_focal_loss_logits(
            x, jnp.asarray(tgt), ind, mask, cat))(x0)
        assert float(jnp.abs(g_clamped).sum()) == 0.0       # the trap
        assert float(g_logits[0, 0, 0, 3, 0]) < -0.5        # alive, pushing up
