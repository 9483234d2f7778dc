"""Data layer tests: ROI geometry, dataset loading, loader sharding,
pipeline-vs-device target parity, evaluation report format."""

import json
import os

import numpy as np
import pytest

from rtpose_tpu.data import (
    CRUWPoseDataset, CubeGeometry, BatchLoader, shard_indices,
    generate_synthetic_dataset,
)
from rtpose_tpu.data.synthetic import dataset_cfg, ROI1


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cruw"))
    keys = generate_synthetic_dataset(root, num_seqs=2, frames_per_seq=4)
    return root, keys


class TestGeometry:
    def test_roi1_crop_is_16_64_160(self):
        """The flagship ROI must produce the (16, 64, 160) grid
        (SURVEY.md §6, configs/.../hr3d_one_hm_doppler.py:37)."""
        geom = CubeGeometry.from_roi({k: list(v) for k, v in ROI1.items()})
        assert geom.grid_zyx == (16, 64, 160)

    def test_full_cube_axes(self):
        z, y, x = CubeGeometry.full_axes()
        assert (len(z), len(y), len(x)) == (32, 128, 256)

    def test_no_roi(self):
        geom = CubeGeometry.from_roi(None)
        assert geom.grid_zyx == (32, 128, 256)


class TestDataset:
    def test_doppler_sample_shapes(self, synth_root):
        root, _ = synth_root
        ds = CRUWPoseDataset(dict(DATASET=dataset_cfg(root)), "Train.json",
                             split="train")
        assert len(ds) == 8
        item = ds[0]
        assert item["rdr_tensor"].shape == (16, 64, 160, 32)
        assert item["rdr_tensor"].dtype == np.float32
        assert item["rdr_tensor"].min() >= 0.0
        assert item["poses"].shape == (1, 15, 3)
        assert item["num_poses"] == 1

    def test_seq_offset_rekeys_sequences(self, tmp_path):
        """seq_offset shifts seq ids/names so two roots concatenate without
        collisions (tools/gen_skel_data.py's 960-frame concat pair)."""
        root = str(tmp_path / "off")
        keys = generate_synthetic_dataset(root, num_seqs=2, frames_per_seq=1,
                                          rdr_type="zyx_real", seq_offset=5)
        meta = open(os.path.join(root, "file_meta.txt")).read().splitlines()
        assert meta == ["5,2024_0101_1005", "6,2024_0101_1006"]
        assert all(k.split("/")[0] in ("5", "6") for k in keys["Train"])
        train = json.load(open(os.path.join(root, "Train.json")))
        assert sorted(train) == ["5", "6"]

    def test_zyx_real_single_channel(self, tmp_path):
        root = str(tmp_path / "zyx")
        generate_synthetic_dataset(root, num_seqs=1, frames_per_seq=2,
                                   rdr_type="zyx_real")
        cfg = dataset_cfg(root, rdr_type="zyx_real")
        ds = CRUWPoseDataset(dict(DATASET=cfg), "Train.json", split="train")
        assert ds[0]["rdr_tensor"].shape == (16, 64, 160, 1)

    def test_evaluation_perfect_predictions(self, synth_root):
        root, keys = synth_root
        ds = CRUWPoseDataset(dict(DATASET=dataset_cfg(root)), "Test.json",
                             split="test")
        gt = json.load(open(os.path.join(root, "Test.json")))
        dets = {}
        for key in keys["Test"]:
            seq, frame, rdr = key.split("/")
            pose = gt[seq][frame][0]["pose"]
            dets[key] = {"keypoints": [(j, *pose[j], 1.0) for j in range(15)]}
        res, _ = ds.evaluation(dets)
        assert res["results"]["MPJPE"] == pytest.approx(0.0, abs=1e-9)
        assert res["results"]["ABS_MPJPE"] == pytest.approx(0.0, abs=1e-9)
        assert "PJPE_14" in res["results"]
        assert "ALL" in res["seq_results"]

    def test_evaluation_known_error(self, synth_root):
        root, keys = synth_root
        ds = CRUWPoseDataset(dict(DATASET=dataset_cfg(root)), "Test.json",
                             split="test")
        gt = json.load(open(os.path.join(root, "Test.json")))
        dets = {}
        for key in keys["Test"]:
            seq, frame, rdr = key.split("/")
            pose = np.asarray(gt[seq][frame][0]["pose"])
            shifted = pose + np.array([0.05, 0, 0])  # 5 cm x-shift
            dets[key] = {"keypoints": [(j, *shifted[j], 1.0) for j in range(15)]}
        res, _ = ds.evaluation(dets)
        # constant shift: ABS_MPJPE = 50mm, root-relative MPJPE = 0
        assert res["results"]["ABS_MPJPE"] == pytest.approx(50.0, rel=1e-6)
        assert res["results"]["MPJPE"] == pytest.approx(0.0, abs=1e-9)


class TestLoader:
    def test_shard_partition(self):
        # every index appears exactly once across shards (after padding)
        shards = [shard_indices(10, epoch=3, shuffle=True, num_shards=4,
                                shard_id=i, drop_last=False) for i in range(4)]
        allidx = np.concatenate(shards)
        assert len(allidx) == 12  # padded to multiple of 4
        assert set(allidx.tolist()) == set(range(10))
        assert all(len(s) == 3 for s in shards)

    def test_epoch_reshuffles(self):
        a = shard_indices(100, 0, True, 1, 0, True)
        b = shard_indices(100, 1, True, 1, 0, True)
        assert not np.array_equal(a, b)
        # deterministic per epoch
        np.testing.assert_array_equal(a, shard_indices(100, 0, True, 1, 0, True))

    def test_batches_and_padding(self, synth_root):
        root, _ = synth_root
        ds = CRUWPoseDataset(dict(DATASET=dataset_cfg(root)), "Test.json",
                             split="test")
        loader = BatchLoader(ds, batch_size=3, shuffle=False, drop_last=False)
        batches = list(loader)
        assert len(batches) == 3  # 8 samples / bs 3 -> 3,3,2(padded)
        assert batches[0]["rdr_tensor"].shape == (3, 16, 64, 160, 32)
        assert batches[0]["valid"] == 3
        assert batches[-1]["valid"] == 2
        assert batches[-1]["rdr_tensor"].shape == (3, 16, 64, 160, 32)
        assert len(batches[0]["meta"]) == 3

    def test_num_workers_matches_serial(self, synth_root):
        """workers_per_gpu parity: the threaded sample-load pool must yield
        byte-identical batches in the same order as serial loading."""
        root, _ = synth_root
        ds = CRUWPoseDataset(dict(DATASET=dataset_cfg(root)), "Train.json",
                             split="train")
        serial = BatchLoader(ds, batch_size=3, shuffle=True, seed=2)
        pooled = BatchLoader(ds, batch_size=3, shuffle=True, seed=2,
                             num_workers=4)
        serial.set_epoch(1)
        pooled.set_epoch(1)
        for bs_, bp in zip(serial, pooled):
            assert bs_["valid"] == bp["valid"]
            np.testing.assert_array_equal(bs_["rdr_tensor"], bp["rdr_tensor"])
            np.testing.assert_array_equal(bs_["poses"], bp["poses"])
            assert [m for m in bs_["meta"]] == [m for m in bp["meta"]]

    def test_train_group_sampler_full_batches(self, synth_root):
        """TRAIN loaders see GroupSampler semantics (the dataset exposes a
        uniform ``flag``, matching the reference's _set_group_flag +
        GroupSampler pairing): every batch is wrap-padded to full size —
        7 samples / batch 3 -> 3 full batches, nothing dropped."""
        root, _ = synth_root
        ds = CRUWPoseDataset(dict(DATASET=dataset_cfg(root)), "Train.json",
                             split="train")
        loader = BatchLoader(ds, batch_size=3, shuffle=True)
        batches = list(loader)
        assert len(loader) == len(batches) == 3
        assert all(b["valid"] == 3 for b in batches)

    def test_device_cached_matches_batch_loader(self, synth_root):
        """DeviceCachedLoader must yield the SAME batches as BatchLoader
        (same epoch-seeded shuffle, padding and 'valid'), with the arrays
        resident on device."""
        import jax

        from rtpose_tpu.data import DeviceCachedLoader

        root, _ = synth_root
        ds = CRUWPoseDataset(dict(DATASET=dataset_cfg(root)), "Train.json",
                             split="train")
        host = BatchLoader(ds, batch_size=3, shuffle=True, seed=5)
        dev = DeviceCachedLoader(ds, batch_size=3, shuffle=True, seed=5)
        assert dev.nbytes > 0
        for epoch in (0, 1):
            host.set_epoch(epoch)
            dev.set_epoch(epoch)
            hb, db = list(host), list(dev)
            # GroupSampler-parity stream: 7 samples wrap-pad to 3 full batches
            assert len(hb) == len(db) == len(host) == len(dev) == 3
            for h, d in zip(hb, db):
                assert isinstance(d["rdr_tensor"], jax.Array)
                np.testing.assert_allclose(np.asarray(d["rdr_tensor"]),
                                           h["rdr_tensor"], rtol=1e-6)
                np.testing.assert_array_equal(np.asarray(d["poses"]),
                                              h["poses"])
                assert d["valid"] == h["valid"]
                assert d["meta"] == h["meta"]

    def test_device_cached_bf16_many_rows(self):
        """Compressed (bfloat16) cache round-trip at a few hundred rows:
        every gathered batch row must equal the host item cast through
        bfloat16 EXACTLY (catches row-index or offset bugs in the big
        flattened-(N, K) gather that small-N tests would miss)."""
        import jax
        import jax.numpy as jnp

        from rtpose_tpu.data import DeviceCachedLoader

        class FakeDS:
            def __len__(self):
                return 300

            def __getitem__(self, i):
                r = np.random.default_rng(1000 + i)
                return {"meta": {},
                        "rdr_tensor": r.normal(size=(4, 6, 8, 4)).astype(np.float32),
                        "poses": r.normal(size=(1, 15, 3)).astype(np.float32),
                        "num_poses": np.int32(1), "mode": "train"}

        ds = FakeDS()
        loader = DeviceCachedLoader(ds, batch_size=8, shuffle=True, seed=0,
                                    cache_dtype="bfloat16")
        assert loader._orig_dtype["rdr_tensor"] == np.float32
        for k, batch in enumerate(loader):
            idx = loader._indices()[k * 8:(k + 1) * 8]
            for j, i in enumerate(idx):
                it = ds[int(i)]
                want = np.asarray(
                    jnp.asarray(it["rdr_tensor"]).astype(jnp.bfloat16)
                    .astype(np.float32))
                np.testing.assert_array_equal(
                    np.asarray(batch["rdr_tensor"][j], np.float32), want)
            if k >= 3:
                break

    def test_device_cached_size_cap(self, synth_root):
        from rtpose_tpu.data import DeviceCachedLoader

        root, _ = synth_root
        ds = CRUWPoseDataset(dict(DATASET=dataset_cfg(root)), "Train.json",
                             split="train")
        with pytest.raises(ValueError, match="does not fit|GB"):
            DeviceCachedLoader(ds, batch_size=3, max_bytes=1000)

    def test_cache_compression_spares_labels(self):
        """cache_dtype compresses only large float keys: the pose LABELS
        stay full precision (a bf16 quantum at 5-8 m world coords is 3-6 cm
        of silent label noise), and a cast that does not shrink bytes
        (f16 raw cubes -> bf16) is skipped."""
        from rtpose_tpu.data.loader import _numeric_spec

        item = {"meta": {},
                "rdr_tensor": np.zeros((4, 6, 8, 4), np.float32),   # 3 KB
                "rdr_raw": np.zeros((4, 6, 8, 4), np.float16),      # 1.5 KB
                "poses": np.zeros((1, 15, 3), np.float32),          # 180 B
                "num_poses": np.int32(1), "mode": "train"}
        keys, shapes, dtypes, orig = _numeric_spec(item, "bfloat16")
        assert dtypes["rdr_tensor"].itemsize == 2 and "rdr_tensor" in orig
        assert dtypes["poses"] == np.float32 and "poses" not in orig
        assert dtypes["rdr_raw"] == np.float16 and "rdr_raw" not in orig
        assert dtypes["num_poses"] == np.int32

    def test_device_cached_float8_roundtrip(self):
        """float8_e4m3fn cache (the over-HBM single-chip lever, 4x smaller):
        gathered batches equal the host item cast through f8 exactly, and
        poses come back bit-exact f32."""
        import jax.numpy as jnp

        from rtpose_tpu.data import DeviceCachedLoader

        class FakeDS:
            def __len__(self):
                return 16

            def __getitem__(self, i):
                r = np.random.default_rng(77 + i)
                return {"meta": {},
                        "rdr_tensor": r.normal(size=(4, 6, 8, 4)).astype(np.float32),
                        "poses": r.normal(size=(1, 15, 3)).astype(np.float32),
                        "num_poses": np.int32(1), "mode": "train"}

        ds = FakeDS()
        loader = DeviceCachedLoader(ds, batch_size=4, shuffle=False, seed=0,
                                    cache_dtype="float8_e4m3fn")
        batch = next(iter(loader))
        for j in range(4):
            it = ds[j]
            want = np.asarray(jnp.asarray(it["rdr_tensor"])
                              .astype(jnp.float8_e4m3fn).astype(np.float32))
            np.testing.assert_array_equal(
                np.asarray(batch["rdr_tensor"][j], np.float32), want)
            np.testing.assert_array_equal(np.asarray(batch["poses"][j]),
                                          it["poses"])


class TestPipelineParity:
    def test_host_pipeline_matches_device_assigner(self, synth_root):
        import jax
        import jax.numpy as jnp
        from rtpose_tpu.core.targets import PoseTargetSpec, assign_pose_targets
        from rtpose_tpu.data.pipelines import AssignLabelPose2

        root, _ = synth_root
        cfg = dict(DATASET=dataset_cfg(root))
        assigner_cfg = dict(
            target_assigner=dict(tasks=[dict(num_class=1, class_names=["Pelvis"])]),
            out_size_factor=[1, 1, 1], gaussian_overlap=0.1,
            max_poses=1, min_radius=2)
        pipeline = [dict(type="AssignLabelPose2", cfg=assigner_cfg)]
        ds = CRUWPoseDataset(cfg, "Train.json", split="train", pipeline=pipeline)
        item = ds[0]
        assert item["hm"][0].shape == (16, 64, 160, 1)

        spec = PoseTargetSpec(
            grid_zyx=(16, 64, 160),
            pc_range_min_xyz=(ROI1["x"][0], ROI1["y"][0], ROI1["z"][0]),
            voxel_size_xyz=(0.0453125, 0.15703125, 0.3625),
            max_poses=1, min_radius=2, mode="one_hm", num_classes=1)
        dev = jax.jit(lambda p, n: assign_pose_targets(p, n, spec))(
            jnp.asarray(item["poses"]), jnp.int32(item["num_poses"]))
        np.testing.assert_allclose(np.transpose(np.asarray(dev["hm"]), (1, 2, 3, 0)),
                                   item["hm"][0], atol=3e-6)
        np.testing.assert_array_equal(np.asarray(dev["ind"]), item["ind"][0])
        np.testing.assert_allclose(np.asarray(dev["anno_pose"]),
                                   item["anno_pose"][0], rtol=3e-6, atol=3e-5)


class TestComplexCube:
    def test_dzyx_complex_shapes(self, tmp_path):
        root = str(tmp_path / "cx")
        generate_synthetic_dataset(root, num_seqs=1, frames_per_seq=2,
                                   rdr_type="dzyx_complex", doppler_bins=8)
        cfg = dataset_cfg(root, rdr_type="dzyx_complex")
        ds = CRUWPoseDataset(dict(DATASET=cfg), "Train.json", split="train")
        item = ds[0]
        # (2D, Z, Y, X) -> channels-last (Z, Y, X, 2D)
        assert item["rdr_tensor"].shape == (16, 64, 160, 16)
        assert np.isfinite(item["rdr_tensor"]).all()


class TestStreamingDeviceLoader:
    def _ds(self, root):
        return CRUWPoseDataset(dict(DATASET=dataset_cfg(root)), "Train.json",
                               split="train")

    def test_single_chunk_visits_all_once(self, synth_root):
        root, _ = synth_root
        from rtpose_tpu.data import StreamingDeviceLoader
        ds = self._ds(root)
        ld = StreamingDeviceLoader(ds, batch_size=3, chunk_bytes=10**12,
                                   shuffle=True, seed=4)
        assert len(ld.chunks) == 1
        ld.set_epoch(2)
        seen = []
        for b in ld:
            assert b["rdr_tensor"].shape == (3, 16, 64, 160, 32)
            seen += [m["frame"] if isinstance(m, dict) and "frame" in m else i
                     for i, m in enumerate(b["meta"])]
        # 6 train samples at bs 3: 6 slots visited (no duplication needed)
        assert len(seen) == len(ld) * 3 == ld.n

    def test_multi_chunk_coverage_and_order_varies(self, synth_root):
        """3 chunks: every sample appears exactly once per epoch (modulo the
        batch-divisibility pad), epochs reshuffle chunk + within order."""
        root, _ = synth_root
        from rtpose_tpu.data import StreamingDeviceLoader
        ds = self._ds(root)
        per_sample = 16 * 64 * 160 * 32 * 4
        ld = StreamingDeviceLoader(ds, batch_size=2, chunk_bytes=per_sample * 2,
                                   shuffle=True, seed=4)
        assert len(ld.chunks) == 4   # 8 train samples, 2 per chunk
        assert all(len(c) == 2 for c in ld.chunks)

        def epoch_tensor_sums(epoch):
            ld.set_epoch(epoch)
            sums = []
            for b in ld:
                a = np.asarray(b["rdr_tensor"])
                sums += [float(a[i].sum()) for i in range(a.shape[0])]
            return sums

        e0, e1 = epoch_tensor_sums(0), epoch_tensor_sums(1)
        assert len(e0) == 8
        # same multiset of samples each epoch, different order
        assert sorted(e0) == pytest.approx(sorted(e1))
        assert e0 != e1

    def test_matches_device_cached_content(self, synth_root):
        """Single-chunk streaming gathers the same per-sample arrays the
        DeviceCachedLoader serves (content check, independent of order)."""
        root, _ = synth_root
        from rtpose_tpu.data import DeviceCachedLoader, StreamingDeviceLoader
        ds = self._ds(root)
        sld = StreamingDeviceLoader(ds, batch_size=4, chunk_bytes=10**12,
                                    shuffle=False, seed=0)
        dcl = DeviceCachedLoader(ds, batch_size=4, shuffle=False,
                                 drop_last=True)
        # unshuffled streaming keeps dataset order: position-exact equality
        s_sums = [float(np.asarray(b["rdr_tensor"])[i].sum())
                  for b in sld for i in range(4)]
        d_sums = [float(np.asarray(b["rdr_tensor"])[i].sum())
                  for b in dcl for i in range(4)]
        assert len(s_sums) == len(d_sums) == 8
        assert s_sums == pytest.approx(d_sums)

    def test_valid_marks_padding(self, synth_root):
        """8 samples at bs 3 -> 9 slots; the final unshuffled batch carries
        valid=2 (one pad repeat), matching the BatchLoader contract."""
        root, _ = synth_root
        from rtpose_tpu.data import StreamingDeviceLoader
        ds = self._ds(root)
        ld = StreamingDeviceLoader(ds, batch_size=3, chunk_bytes=10**12,
                                   shuffle=False, seed=0)
        valids = [int(b["valid"]) for b in ld]
        assert valids == [3, 3, 2]

    def test_equal_shards_across_hosts(self, synth_root):
        """Uneven dataset sizes must still give every host the same number
        of steps (multi-host SPMD: unequal shards deadlock collectives)."""
        root, _ = synth_root
        from rtpose_tpu.data import StreamingDeviceLoader
        ds = self._ds(root)    # 8 samples; 3 shards -> pad to 9, 3 each
        lens = []
        for sid in range(3):
            ld = StreamingDeviceLoader(ds, batch_size=3, chunk_bytes=10**12,
                                       shuffle=True, seed=1, num_shards=3,
                                       shard_id=sid)
            lens.append(len(ld))
        assert len(set(lens)) == 1

    def test_trains(self, synth_root):
        """A few real fused train steps over streaming batches."""
        root, _ = synth_root
        import jax
        import jax.numpy as jnp
        from rtpose_tpu.data import StreamingDeviceLoader
        from test_solver_engine import tiny_model_and_spec
        # tiny in-memory dataset in the tiny-grid geometry
        from rtpose_tpu.engine import create_train_state, make_train_step
        from rtpose_tpu.solver import adam_one_cycle

        model, head, spec, GRID = tiny_model_and_spec()
        Z, Y, X = GRID

        class DS:
            def __len__(self):
                return 10

            def __getitem__(self, i):
                r = np.random.default_rng(i)
                return {
                    "rdr_tensor": r.normal(size=(Z, Y, X, 1)).astype(np.float32),
                    "poses": (r.uniform(0.3, 0.7, size=(1, 15, 3))
                              * np.array([X, Y, Z]) * np.array([0.5, 1.0, 0.5])
                              + np.array([0.0, -4.0, -1.0])).astype(np.float32),
                    "num_poses": np.int32(1), "meta": {"i": i}}

        per = Z * Y * X * 4
        ld = StreamingDeviceLoader(DS(), batch_size=2, chunk_bytes=per * 4,
                                   shuffle=True, seed=0,
                                   cache_dtype="bfloat16")
        opt = adam_one_cycle(lambda s: 1e-3, None, weight_decay=0.0,
                             grad_clip_norm=None)
        state = create_train_state(model, opt,
                                   jnp.zeros((1, Z, Y, X, 1), jnp.float32))
        step = jax.jit(make_train_step(model, head, spec, opt))
        losses = []
        for epoch in range(2):
            ld.set_epoch(epoch)
            for b in ld:
                dev = {k: v for k, v in b.items() if k not in ("meta", "valid")}
                state, m = step(state, dev)
                losses.append(float(np.asarray(m["loss"])))
        assert len(losses) == 10 and np.isfinite(losses).all()


class TestGroupSampling:
    """Aspect-flag group batching (reference GroupSampler /
    DistributedGroupSampler, datasets/loader/sampler.py:98-223): datasets
    exposing a ``flag`` array get flag-homogeneous batches."""

    class FlaggedDS:
        def __init__(self, flags):
            self.flag = np.asarray(flags)

        def __len__(self):
            return len(self.flag)

        def __getitem__(self, i):
            return {"x": np.float32(i), "meta": {"i": i}}

    def test_batches_are_flag_homogeneous(self):
        from rtpose_tpu.data.loader import group_shard_indices
        flags = np.array([0] * 5 + [1] * 7)
        for epoch in range(3):
            idx = group_shard_indices(flags, batch_size=3, epoch=epoch,
                                      shuffle=True, num_shards=1, shard_id=0)
            assert len(idx) % 3 == 0
            for b in idx.reshape(-1, 3):
                assert len(set(flags[b])) == 1, "mixed-flag batch"
            # every sample appears (padding is wrap-around, never dropping)
            assert set(idx) == set(range(12))

    def test_sharding_equal_and_disjoint_cover(self):
        from rtpose_tpu.data.loader import group_shard_indices
        flags = np.array([0] * 5 + [1] * 4 + [2] * 9)
        shards = [group_shard_indices(flags, 2, epoch=1, shuffle=True,
                                      num_shards=2, shard_id=s)
                  for s in range(2)]
        assert len(shards[0]) == len(shards[1])
        union = set(shards[0]) | set(shards[1])
        assert union == set(range(18))
        for sh in shards:
            for b in sh.reshape(-1, 2):
                assert len(set(flags[b])) == 1

    def test_group_smaller_than_batch_pads_by_repetition(self):
        """A flag group smaller than the padding amount (tiny dataset,
        group < batch_size) must still pad to a full batch multiple — the
        single-pass wrap-around ``idx[:extra]`` fell short and crashed the
        CLI on sub-batch datasets (round-5 CI regression)."""
        from rtpose_tpu.data.loader import group_shard_indices
        flags = np.array([0] * 3 + [1] * 2)      # both groups < batch_size
        idx = group_shard_indices(flags, batch_size=8, epoch=0,
                                  shuffle=True, num_shards=1, shard_id=0)
        assert len(idx) == 16 and len(idx) % 8 == 0
        for b in idx.reshape(-1, 8):
            assert len(set(flags[b])) == 1, "mixed-flag batch"
        assert set(idx) == set(range(5))
        # multi-shard: every shard still gets whole batches
        shards = [group_shard_indices(flags, 4, epoch=0, shuffle=True,
                                      num_shards=2, shard_id=s)
                  for s in range(2)]
        assert len(shards[0]) == len(shards[1])
        assert len(shards[0]) % 4 == 0

    def test_batchloader_uses_flags(self):
        ds = self.FlaggedDS([0] * 6 + [1] * 6)
        loader = BatchLoader(ds, batch_size=3, shuffle=True, prefetch=0)
        loader.set_epoch(2)
        flags = np.asarray(ds.flag)
        seen = []
        for batch in loader:
            ids = [m["i"] for m in batch["meta"]]
            seen += ids
            assert len(set(flags[ids])) == 1
        assert set(seen) == set(range(12))

    def test_uniform_flag_keeps_plain_permutation_order(self):
        """A UNIFORM flag array (PointCloudDataset's default ``np.ones``)
        must leave the epoch order bit-identical to a flagless dataset:
        group batching with one group is semantically the plain sampler,
        and the extra cross-group batch reshuffle measurably shifted
        validated training trajectories into the predict-the-mean basin
        (round-5 regression after CRUWPoseDataset was wired to the base
        class).  Wrap-padding parity for non-multiples is kept."""
        from rtpose_tpu.data.loader import group_shard_indices, shard_indices
        for epoch in (0, 1, 7):
            plain = shard_indices(480, epoch, True, 1, 0, True)
            grouped = group_shard_indices(np.ones(480, np.uint8), 8, epoch,
                                          True, 1, 0)
            assert np.array_equal(plain, grouped), epoch

        # through the loader: uniform-flag dataset == flagless order
        flagged = self.FlaggedDS([1] * 12)
        loader = BatchLoader(flagged, batch_size=3, shuffle=True, prefetch=0)
        loader.set_epoch(2)
        expect = shard_indices(12, loader.seed + 2, True, 1, 0, True)
        got = [m["i"] for b in loader for m in b["meta"]]
        assert got == list(expect)

    def test_unflagged_behavior_unchanged(self):
        """No ``flag`` on the dataset -> the plain epoch-seeded permutation
        (existing training trajectories must not shift)."""
        from rtpose_tpu.data.loader import shard_indices

        class DS:
            def __len__(self):
                return 10

            def __getitem__(self, i):
                return {"x": np.float32(i)}

        loader = BatchLoader(DS(), batch_size=2, shuffle=True, prefetch=0)
        loader.set_epoch(4)
        np.testing.assert_array_equal(
            loader._indices(), shard_indices(10, 4, True, 1, 0, True))

    def test_wrappers_propagate_flags(self):
        from rtpose_tpu.data.wrappers import ConcatDataset, RepeatDataset
        a, b = self.FlaggedDS([0, 0, 1]), self.FlaggedDS([1, 2])
        cat = ConcatDataset([a, b])
        np.testing.assert_array_equal(cat.flag, [0, 0, 1, 1, 2])
        rep = RepeatDataset(a, times=2)
        np.testing.assert_array_equal(rep.flag, [0, 0, 1, 0, 0, 1])

        class Plain:
            def __len__(self):
                return 2

            def __getitem__(self, i):
                return {}

        assert ConcatDataset([a, Plain()]).flag is None
        assert RepeatDataset(Plain(), 2).flag is None


class TestRoiOnlyRoots:
    """roi_only generated roots (DIR.CUBES_ARE_ROI) are byte-equivalent to
    full-cube roots: same seed -> identical loader outputs at ~6x less disk."""

    def test_items_identical_to_full_root(self, tmp_path):
        full_root = str(tmp_path / "full")
        roi_root = str(tmp_path / "roi")
        generate_synthetic_dataset(full_root, num_seqs=1, frames_per_seq=2,
                                   seed=9, pose_mode="skeleton")
        generate_synthetic_dataset(roi_root, num_seqs=1, frames_per_seq=2,
                                   seed=9, pose_mode="skeleton", roi_only=True)
        ds_full = CRUWPoseDataset(dict(DATASET=dataset_cfg(full_root)),
                                  "Train.json", split="train")
        ds_roi = CRUWPoseDataset(dict(DATASET=dataset_cfg(roi_root,
                                                          roi_only=True)),
                                 "Train.json", split="train")
        assert len(ds_full) == len(ds_roi) == 2
        for i in range(2):
            a, b = ds_full[i], ds_roi[i]
            np.testing.assert_array_equal(a["rdr_tensor"], b["rdr_tensor"])
            np.testing.assert_array_equal(a["poses"], b["poses"])

    def test_raw_path_identical(self, tmp_path):
        full_root = str(tmp_path / "fullr")
        roi_root = str(tmp_path / "roir")
        generate_synthetic_dataset(full_root, num_seqs=1, frames_per_seq=1,
                                   seed=11)
        generate_synthetic_dataset(roi_root, num_seqs=1, frames_per_seq=1,
                                   seed=11, roi_only=True)
        ds_full = CRUWPoseDataset(dict(DATASET=dataset_cfg(full_root)),
                                  "Train.json", split="train",
                                  device_preprocess=True)
        ds_roi = CRUWPoseDataset(dict(DATASET=dataset_cfg(roi_root,
                                                          roi_only=True)),
                                 "Train.json", split="train",
                                 device_preprocess=True)
        a, b = ds_full[0], ds_roi[0]
        np.testing.assert_array_equal(a["rdr_raw"], b["rdr_raw"])

    def test_disk_savings(self, tmp_path):
        roi_root = str(tmp_path / "small")
        generate_synthetic_dataset(roi_root, num_seqs=1, frames_per_seq=1,
                                   seed=3, roi_only=True,
                                   test_frames_per_seq=0)
        import glob
        files = glob.glob(os.path.join(roi_root, "*", "DZYX_npy_f16", "*.npy"))
        assert len(files) == 1
        arr = np.load(files[0])
        assert arr.shape == (32, 16, 64, 160)
