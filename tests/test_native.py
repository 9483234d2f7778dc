"""Native C++ cube loader tests: parity with the numpy path."""

import os

import numpy as np
import pytest

from rtpose_tpu import native
from rtpose_tpu.data import CRUWPoseDataset, generate_synthetic_dataset
from rtpose_tpu.data.synthetic import dataset_cfg


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("native_data"))
    generate_synthetic_dataset(root, num_seqs=1, frames_per_seq=3)
    return root


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
class TestNativeLoader:
    def test_probe(self, synth_root):
        ds = CRUWPoseDataset(dict(DATASET=dataset_cfg(synth_root)),
                             "Train.json", split="train", use_native=False)
        s = ds.samples[0]
        path = os.path.join(ds.root_dir, ds.seq_id_to_name[s["seq"]],
                            ds.rdr_dirname, f"{s['rdr_frame']}.npy")
        shape, dtype = native.probe(path)
        assert shape == (32, 32, 128, 256)
        assert dtype == "2"  # f16

    def test_matches_numpy_path(self, synth_root):
        cfg = dict(DATASET=dataset_cfg(synth_root))
        ds_np = CRUWPoseDataset(cfg, "Train.json", split="train",
                                use_native=False)
        ds_nat = CRUWPoseDataset(cfg, "Train.json", split="train",
                                 use_native=True)
        for i in range(len(ds_np)):
            a = ds_np[i]["rdr_tensor"]
            b = ds_nat[i]["rdr_tensor"]
            assert a.shape == b.shape == (16, 64, 160, 32)
            np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-6)

    def test_batch_loader(self, synth_root):
        ds = CRUWPoseDataset(dict(DATASET=dataset_cfg(synth_root)),
                             "Train.json", split="train", use_native=False)
        paths = [os.path.join(ds.root_dir, ds.seq_id_to_name[s["seq"]],
                              ds.rdr_dirname, f"{s['rdr_frame']}.npy")
                 for s in ds.samples]
        out = native.load_cube_batch(paths, ds.geom.roi_idx, ds.norm_start,
                                     ds.norm_scale, 32, ds.geom.grid_zyx,
                                     nthreads=2)
        assert out.shape == (3, 16, 64, 160, 32)
        for i in range(3):
            np.testing.assert_allclose(out[i], ds[i]["rdr_tensor"],
                                       rtol=1e-6, atol=1e-6)

    def test_bad_path_returns_none(self):
        assert native.load_cube("/nonexistent.npy", (0, 1, 0, 1, 0, 1),
                                0.0, 1.0, 2, (2, 2, 2)) is None
