"""Tests for the auxiliary parity components: dataset factory, the abstract
PointCloudDataset base, KITTI-style mAP eval, the OSS path facade, and the
HTTP metrics logger hook."""

import numpy as np
import pytest

from rtpose_tpu.core import kitti_eval
from rtpose_tpu.data import (PointCloudDataset, dataset_factory, get_dataset)
from rtpose_tpu.utils.oss import OSSPath, set_client


class TestDatasetFactory:
    def test_short_names_resolve(self):
        from rtpose_tpu.data import CRUWPoseDataset
        assert get_dataset("CRUW_POSE") is CRUWPoseDataset
        assert get_dataset("CRUW_POSE_Dataset") is CRUWPoseDataset

    def test_all_factory_entries_exist(self):
        for short in dataset_factory:
            assert get_dataset(short) is not None

    def test_unknown_raises_with_listing(self):
        with pytest.raises(KeyError, match="CRUW_POSE"):
            get_dataset("NUSC")  # broken import in the reference; absent here


class TestPointCloudDataset:
    def test_abstract_surface(self):
        ds = PointCloudDataset.__new__(PointCloudDataset)
        for call in (lambda: ds[0], lambda: len(ds),
                     lambda: ds.get_sensor_data(0),
                     lambda: ds.evaluation({}),
                     lambda: ds.ground_truth_annotations):
            with pytest.raises(NotImplementedError):
                call()

    def test_concrete_subclass_gets_flag_and_pipeline(self):
        calls = []

        class Tiny(PointCloudDataset):
            def __len__(self):
                return 4

            def __getitem__(self, i):
                item = {"points": np.zeros((3, 4), np.float32)}
                return (self.pipeline(item, info=None)
                        if self.pipeline else item)

        def stage(item, info=None):
            calls.append(1)
            return item

        ds = Tiny("/tmp", pipeline=stage)
        assert ds.flag is not None and ds.flag.shape == (4,)
        assert np.all(ds.flag == 1)
        ds[0]
        assert calls  # pipeline wired through

    def test_group_batching_consumes_flag(self):
        from rtpose_tpu.data.loader import group_shard_indices

        class Grouped(PointCloudDataset):
            def __len__(self):
                return 6

            def __getitem__(self, i):
                return {}

        ds = Grouped("/tmp")
        ds.flag = np.array([0, 0, 0, 1, 1, 1], np.uint8)
        idx = group_shard_indices(ds.flag, 3, epoch=0, shuffle=True,
                                  num_shards=1, shard_id=0)
        for b in range(len(idx) // 3):
            batch = ds.flag[idx[3 * b : 3 * b + 3]]
            assert len(set(batch.tolist())) == 1  # flag-homogeneous


def _anno(locs, names, scores=None):
    locs = np.asarray(locs, np.float32).reshape(-1, 3)
    a = {"name": np.asarray(names),
         "location": locs,
         "dimensions": np.ones_like(locs),
         "rotation_y": np.zeros(len(locs), np.float32)}
    if scores is not None:
        a["score"] = np.asarray(scores, np.float32)
    return a


class TestKittiEval:
    def test_image_overlap_golden(self):
        a = np.array([[0.0, 0.0, 2.0, 2.0]])
        b = np.array([[1.0, 1.0, 3.0, 3.0], [10.0, 10.0, 11.0, 11.0]])
        iou = kitti_eval.image_box_overlap(a, b)
        np.testing.assert_allclose(iou, [[1.0 / 7.0, 0.0]], rtol=1e-6)
        # criterion 0: inter / area_a
        ov = kitti_eval.image_box_overlap(a, b, criterion=0)
        np.testing.assert_allclose(ov, [[0.25, 0.0]], rtol=1e-6)

    def test_bev_overlap_axis_aligned_golden(self):
        # unit squares offset by 0.5 in x: inter 0.5, union 1.5
        a = np.array([[0, 0, 0, 1, 1, 1, 0]], np.float32)
        b = np.array([[0.5, 0, 0, 1, 1, 1, 0]], np.float32)
        iou = kitti_eval.bev_box_overlap(a, b)
        np.testing.assert_allclose(iou, [[0.5 / 1.5]], rtol=1e-5)

    def test_bev_overlap_rotated_matches_ops(self):
        import jax.numpy as jnp

        from rtpose_tpu.ops.nms import boxes_iou_bev
        rng = np.random.default_rng(0)
        a = np.concatenate([rng.normal(size=(4, 2)), np.zeros((4, 1)),
                            rng.uniform(0.5, 2.0, (4, 3)),
                            rng.uniform(-np.pi, np.pi, (4, 1))],
                           axis=1).astype(np.float32)
        got = kitti_eval.bev_box_overlap(a, a)
        want = np.asarray(boxes_iou_bev(jnp.asarray(a), jnp.asarray(a)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_box3d_overlap_golden(self):
        # identical boxes -> 1; half-z-overlap unit cubes -> 0.5/1.5
        a = np.array([[0, 0, 0, 1, 1, 1, 0]], np.float32)
        b = np.array([[0, 0, 0.5, 1, 1, 1, 0]], np.float32)
        np.testing.assert_allclose(kitti_eval.box3d_overlap(a, a), [[1.0]],
                                   rtol=1e-5)
        np.testing.assert_allclose(kitti_eval.box3d_overlap(a, b),
                                   [[0.5 / 1.5]], rtol=1e-5)

    def test_statistics_greedy_matching(self):
        # 2 GT, 3 dets: best-scored det matches gt0, duplicate becomes FP
        overlaps = np.array([[0.9, 0.8, 0.0],
                             [0.0, 0.0, 0.6]])
        scores = np.array([0.9, 0.8, 0.7])
        tp, fp, fn, ms = kitti_eval.compute_statistics(overlaps, scores, 0.5)
        assert (tp, fp, fn) == (2, 1, 0)
        assert ms == [0.9, 0.7]

    def test_perfect_detection_ap_is_one(self):
        gts, dts = [], []
        rng = np.random.default_rng(1)
        for _ in range(4):
            locs = rng.uniform(-5, 5, (3, 3))
            gts.append(_anno(locs, ["Ped"] * 3))
            dts.append(_anno(locs, ["Ped"] * 3,
                             scores=rng.uniform(0.5, 1.0, 3)))
        ap = kitti_eval.eval_class(gts, dts, "Ped", "3d", min_overlap=0.5)
        assert ap == pytest.approx(1.0, abs=1e-6)

    def test_missed_and_spurious_lower_ap(self):
        locs = np.array([[0, 0, 0], [3, 3, 0]], np.float32)
        gt = _anno(locs, ["Ped", "Ped"])
        # detect only the first, plus a far spurious high-score box
        dt = _anno(np.array([[0, 0, 0], [50, 50, 0]], np.float32),
                   ["Ped", "Ped"], scores=[0.9, 0.95])
        res = kitti_eval.get_official_eval_result([gt], [dt], ["Ped"],
                                                  min_overlaps=0.5)
        assert 0.0 < res["3d"]["Ped"] < 1.0
        assert "Ped AP" in res["summary"]

    def test_class_filtering(self):
        locs = np.zeros((1, 3), np.float32)
        gt = _anno(locs, ["Cyclist"])
        dt = _anno(locs, ["Ped"], scores=[0.9])
        # no Ped GT anywhere -> AP 0 by convention
        assert kitti_eval.eval_class([gt], [dt], "Ped", "bev", 0.5) == 0.0


class FakeS3:
    def __init__(self):
        self.blobs = {}

    def put_object(self, Bucket, Key, Body):
        self.blobs[(Bucket, Key)] = bytes(Body)

    def get_object(self, Bucket, Key):
        return {"Body": self.blobs[(Bucket, Key)]}

    def head_object(self, Bucket, Key):
        if (Bucket, Key) not in self.blobs:
            raise KeyError(Key)

    def list_objects(self, Bucket, Prefix):
        return {"Contents": [{"Key": k} for (b, k) in sorted(self.blobs)
                             if b == Bucket and k.startswith(Prefix)]}


class TestOSSPath:
    def test_local_passthrough(self, tmp_path):
        p = OSSPath(str(tmp_path)) / "x.bin"
        p.write_bytes(b"abc")
        assert p.exists() and p.read_bytes() == b"abc"
        assert p.name == "x.bin"
        import os
        assert os.fspath(p) == str(tmp_path / "x.bin")

    def test_remote_requires_client(self):
        set_client(None)
        p = OSSPath("oss://bucket/a/b.npy")
        assert p.remote and p.bucket == "bucket" and p.key == "a/b.npy"
        with pytest.raises(RuntimeError, match="set_client"):
            p.read_bytes()
        with pytest.raises(TypeError):
            import os
            os.fspath(p)

    def test_remote_roundtrip_with_fake_client(self):
        cli = FakeS3()
        set_client(cli)
        try:
            root = OSSPath("oss://bkt/data")
            (root / "a.npy").write_bytes(b"111")
            (root / "b.txt").write_bytes(b"hello")
            assert (root / "a.npy").exists()
            assert not (root / "missing").exists()
            assert (root / "b.txt").read_text() == "hello"
            names = [p.name for p in root.iterdir()]
            assert names == ["a.npy", "b.txt"]
            assert [p.name for p in root.iterdir(suffix=".npy")] == ["a.npy"]
            assert (root / "a.npy").parent.key == "data"
        finally:
            set_client(None)


class TestHTTPLoggerHook:
    def _fake_trainer(self):
        class T:
            pass

        from rtpose_tpu.engine.log_buffer import LogBuffer
        t = T()
        t.log_buffer = LogBuffer()
        t.log_buffer.update({"loss": 1.5})
        t.log_buffer.update({"loss": 2.5})
        t._host_step = 7
        t.epoch = 3
        t.inner_iter = 19
        t.loader = [None] * 40
        t.flush_metrics = lambda: None
        import logging
        t.logger = logging.getLogger("test")
        return t

    def test_posts_interval_payload(self):
        from rtpose_tpu.engine import HTTPLoggerHook
        hook = HTTPLoggerHook("http://localhost:1/metrics", interval=20,
                              session="s1")
        seen = []
        hook._post = seen.append
        hook.after_train_iter(self._fake_trainer())
        assert len(seen) == 1
        payload = seen[0]
        assert payload["session"] == "s1" and payload["step"] == 7
        assert payload["metrics"]["loss"] == pytest.approx(2.0)

    def test_network_failure_is_swallowed(self):
        from rtpose_tpu.engine import HTTPLoggerHook
        # port 1 refuses connections; the hook must warn once, never raise
        hook = HTTPLoggerHook("http://127.0.0.1:1/x", interval=20,
                              timeout=0.2)
        t = self._fake_trainer()
        hook.after_train_iter(t)
        hook.after_train_iter(t)
        assert hook._warned
