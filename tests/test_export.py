"""Round-trip tests for the jax.export serving path (rtpose_tpu/export.py).

TPU-new capability: the predict path (forward + decode) serializes to a
self-contained StableHLO artifact with parameters baked in; serving needs
only jax + the artifact.  (The reference's serving story is re-running
tools/test.py against a .pth checkpoint — reference tools/test.py:1-210.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtpose_tpu.api import assemble
from rtpose_tpu.config import Config
from rtpose_tpu.engine import create_train_state
from rtpose_tpu.export import (export_predict, load_predict, make_predict_fn,
                               save_exported)
from rtpose_tpu.solver import adam_one_cycle

from test_e2e_cli import CONFIG_TEMPLATE, TINY_ROI


@pytest.fixture(scope="module")
def tiny_asm(tmp_path_factory):
    # assemble() is data-free: the dataset root is never touched
    cfg_path = tmp_path_factory.mktemp("exp_cfg") / "tiny.py"
    cfg_path.write_text(CONFIG_TEMPLATE.format(root="/nonexistent",
                                               roi=TINY_ROI))
    asm = assemble(Config.fromfile(str(cfg_path)))
    opt = adam_one_cycle(lambda s: 1e-3, None, weight_decay=0.0,
                         grad_clip_norm=None)
    state = create_train_state(asm.model, opt, asm.example_input(),
                               jax.random.PRNGKey(3))
    return asm, state


class TestExport:
    def test_roundtrip_matches_live(self, tiny_asm, tmp_path):
        """serialize -> file -> deserialize reproduces the live eval step."""
        asm, state = tiny_asm
        B = 2
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(B, *asm.input_shape_zyxc))
                        .astype(np.float32))
        live = make_predict_fn(asm, state.params)(x)

        blob = export_predict(asm, state.params, batch_size=B,
                              platforms=("cpu",))
        path = str(tmp_path / "model.jaxexp")
        save_exported(path, blob)
        predict = load_predict(path)
        out = predict(x)

        live_l, out_l = jax.tree.leaves(live), jax.tree.leaves(out)
        assert len(live_l) == len(out_l) and len(out_l) > 0
        for a, b in zip(live_l, out_l):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)
        assert predict.platforms == ("cpu",)

    def test_multi_platform_artifact(self, tiny_asm):
        """One artifact lowered for cpu AND tpu (no TPU needed to produce
        it); executes on whatever backend is attached."""
        asm, state = tiny_asm
        blob = export_predict(asm, state.params, batch_size=1,
                              platforms=("cpu", "tpu"))
        predict = load_predict(blob)
        assert set(predict.platforms) == {"cpu", "tpu"}
        x = jnp.zeros((1, *asm.input_shape_zyxc), jnp.float32)
        out = predict(x)
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree.leaves(out))

    def test_static_batch_enforced(self, tiny_asm):
        asm, state = tiny_asm
        blob = export_predict(asm, state.params, batch_size=1,
                              platforms=("cpu",))
        predict = load_predict(blob)
        bad = jnp.zeros((2, *asm.input_shape_zyxc), jnp.float32)
        with pytest.raises(Exception):
            predict(bad)


class TestServingFinalDtype:
    """serving_variant(asm, 'bfloat16'): head OUTPUT convs compute in bf16
    on the serving path only (the serving-side form of the
    CenterHead.final_dtype knob, models/center_head.py)."""

    def test_variant_params_apply_verbatim(self, tiny_asm):
        asm, state = tiny_asm
        from rtpose_tpu.api import serving_variant
        var = serving_variant(asm, "bfloat16")
        # rebuild is cfg-level: original asm untouched, override recorded
        assert "final_dtype" not in asm.model_cfg["pose_head"]
        assert var.model_cfg["pose_head"]["final_dtype"] == "bfloat16"

        x = jnp.asarray(np.random.default_rng(2)
                        .normal(size=(1, *asm.input_shape_zyxc))
                        .astype(np.float32))
        f32 = make_predict_fn(asm, state.params)(x)
        b16 = make_predict_fn(var, state.params)(x)  # same params, no reinit
        f32_l, b16_l = jax.tree.leaves(f32), jax.tree.leaves(b16)
        assert len(f32_l) == len(b16_l) > 0
        # close (bf16 has ~8 mantissa bits) but NOT identical — the override
        # must actually reach the head out-convs
        deltas = [float(np.abs(np.asarray(a, np.float64)
                               - np.asarray(b, np.float64)).max())
                  for a, b in zip(f32_l, b16_l)]
        for a, b in zip(f32_l, b16_l):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0.1, atol=0.1)
        assert max(deltas) > 0.0

    def test_export_final_dtype_roundtrip(self, tiny_asm, tmp_path):
        asm, state = tiny_asm
        from rtpose_tpu.api import serving_variant
        var = serving_variant(asm, "bfloat16")
        x = jnp.asarray(np.random.default_rng(3)
                        .normal(size=(1, *asm.input_shape_zyxc))
                        .astype(np.float32))
        live = jax.jit(make_predict_fn(var, state.params))(x)
        blob = export_predict(asm, state.params, batch_size=1,
                              platforms=("cpu",), final_dtype="bfloat16")
        out = load_predict(blob)(x)
        # bf16 compute in the graph: jit fusion order may differ between the
        # live executable and the deserialized artifact — allow bf16-level
        # slack (the f32 paths above pin exactness)
        for a, b in zip(jax.tree.leaves(live), jax.tree.leaves(out)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0.05, atol=0.05)


class TestExportMultiPose:
    def test_multipose_artifact_matches_live(self, tmp_path_factory):
        """max_poses=2 configs export the top-P decode path; artifact output
        ((B,P,K,3) kpts, (B,P) scores) matches the live step."""
        cfg_path = tmp_path_factory.mktemp("exp_mp2") / "tiny_mp2.py"
        cfg_path.write_text(CONFIG_TEMPLATE.format(root="/nonexistent",
                                                   roi=TINY_ROI)
                            .replace("max_poses=1", "max_poses=2"))
        asm = assemble(Config.fromfile(str(cfg_path)))
        assert asm.multi_poses == 2
        opt = adam_one_cycle(lambda s: 1e-3, None, weight_decay=0.0,
                             grad_clip_norm=None)
        state = create_train_state(asm.model, opt, asm.example_input(),
                                   jax.random.PRNGKey(5))

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(1, *asm.input_shape_zyxc))
                        .astype(np.float32))
        live = make_predict_fn(asm, state.params)(x)
        predict = load_predict(export_predict(asm, state.params,
                                              batch_size=1,
                                              platforms=("cpu",)))
        out = predict(x)
        (k_l, s_l), = live
        (k_a, s_a), = out
        assert np.asarray(k_a).shape == (1, 2, 15, 3)
        np.testing.assert_allclose(np.asarray(k_a), np.asarray(k_l),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s_a), np.asarray(s_l),
                                   rtol=1e-5, atol=1e-6)
