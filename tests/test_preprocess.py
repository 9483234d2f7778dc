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
