"""Post-training int8 quantization (ops/quant.py) — the MXU 2x-rate serving
path.  TPU-new capability: the CUDA reference has no quantized inference
(serving there is f32/f16 through tools/test.py); on v5e the MXU contracts
int8 at 394 TOPS vs 197 bf16 TFLOP/s, so the conv-bound HRRadarPose forward
can ~double with per-channel weight / per-tensor activation symmetric PTQ.

Covers: the int8 conv kernels vs their float forms (naive + both folded
formulations), the TorchConv3d quant-context dispatch, jitted calibration,
and the end-to-end calibrate -> int8 predict path on the flagship tiny
assembly (same fixture as the export suite).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtpose_tpu.api import assemble
from rtpose_tpu.config import Config
from rtpose_tpu.engine import create_train_state
from rtpose_tpu.export import calibrate_predict, make_predict_fn
from rtpose_tpu.models.layers import TorchConv3d
from rtpose_tpu.ops import quant
from rtpose_tpu.ops.fold_conv import FOLD, conv3d_naive, fold_x, unfold_x
from rtpose_tpu.solver import adam_one_cycle

from test_e2e_cli import CONFIG_TEMPLATE, TINY_ROI


def _rand(shape, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale)


class TestInt8Conv:
    def test_naive_close_to_float(self):
        x = _rand((2, 4, 6, 8, 16), 0)
        w = _rand((3, 3, 3, 16, 24), 1, 0.2)
        b = _rand((24,), 2)
        ref = conv3d_naive(x, w, b)
        act_scale = float(jnp.max(jnp.abs(x))) / 127.0
        out = quant.conv3d_int8(x, w, b, 1, act_scale, folded=False,
                                out_dtype=jnp.float32)
        # 8-bit symmetric quant of both operands: error bounded well below
        # 2% of the output dynamic range for gaussian inputs
        tol = 0.02 * float(jnp.max(jnp.abs(ref)))
        assert float(jnp.max(jnp.abs(out - ref))) < tol

    @pytest.mark.parametrize("kernel,stride,C,Co", [
        (3, 1, 8, 12),   # expanding: f4-i8 form
        (3, 1, 12, 8),   # contracting: gather-i8 form
        (3, 2, 8, 12),   # strided: folded-kernel form
        (1, 1, 8, 12),   # 1x1: lane-wise matmul form
        (1, 2, 8, 8),    # strided 1x1: folded-kernel form
    ])
    def test_folded_matches_naive_int8(self, kernel, stride, C, Co):
        """Every folded int8 form (gather / f4 / 1x1-matmul, chosen per
        shape) computes the IDENTICAL integer program as the naive int8
        conv: int32 accumulation is exact and the structural zeros
        quantize to 0."""
        x = _rand((2, 4, 6, 16, C), 3)
        w = _rand((kernel, kernel, kernel, C, Co), 4, 0.3)
        b = _rand((Co,), 5)
        act_scale = float(jnp.max(jnp.abs(x))) / 127.0
        naive = quant.conv3d_int8(x, w, b, stride, act_scale, folded=False,
                                  out_dtype=jnp.float32)
        folded = quant.conv3d_int8(fold_x(x), w, b, stride, act_scale,
                                   folded=True, out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(unfold_x(folded)),
                                   np.asarray(naive), rtol=1e-6, atol=1e-6)

    def test_concat_1x1_matches_naive_int8(self):
        """The concat-of-folded int8 matmul (HRNet final fuse conv) equals
        the naive int8 1x1 conv on the unfolded concat input."""
        from rtpose_tpu.ops.fold_conv import conv3d_folded_concat
        blocks = (4, 8)
        xs = [_rand((2, 4, 6, 16, Cb), 10 + i) for i, Cb in enumerate(blocks)]
        w = _rand((1, 1, 1, sum(blocks), 8), 12, 0.3)
        b = _rand((8,), 13)
        x_cat = jnp.concatenate(xs, axis=-1)
        xf_cat = jnp.concatenate([fold_x(x) for x in xs], axis=-1)
        act_scale = float(jnp.max(jnp.abs(x_cat))) / 127.0
        naive = quant.conv3d_int8(x_cat, w, b, 1, act_scale, folded=False,
                                  out_dtype=jnp.float32)
        got = quant.conv3d_int8_concat_1x1(xf_cat, w, b, blocks, act_scale,
                                           jnp.float32)
        np.testing.assert_allclose(np.asarray(unfold_x(got)),
                                   np.asarray(naive), rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("folded", [False, True])
    def test_torchconv3d_int8_dispatch(self, folded):
        x = _rand((1, 4, 4, 8, 8), 6)
        xin = fold_x(x) if folded else x
        m = TorchConv3d(16, kernel=3, folded=folded, name="conv0")
        params = m.init(jax.random.PRNGKey(0), xin)
        ref = m.apply(params, xin)
        scale = float(jnp.max(jnp.abs(x))) / 127.0
        with quant.int8_mode({"conv0": scale}):
            out = m.apply(params, xin)
        tol = 0.03 * float(jnp.max(jnp.abs(ref))) + 1e-6
        assert out.shape == ref.shape
        diff = float(jnp.max(jnp.abs(out - ref)))
        assert diff < tol
        # positive proof the int8 path actually ran: 8-bit rounding of both
        # operands cannot reproduce the float result bit-exactly
        assert diff > 0.0, "int8 dispatch fell through to the float path"

    def test_unscaled_path_falls_through_to_float(self):
        x = _rand((1, 4, 4, 8, 8), 7)
        m = TorchConv3d(8, kernel=3, name="convA")
        params = m.init(jax.random.PRNGKey(0), x)
        ref = m.apply(params, x)
        with quant.int8_mode({"some_other_conv": 1.0}):
            out = m.apply(params, x)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


class TestCalibration:
    def test_scales_record_input_absmax(self):
        m = TorchConv3d(8, kernel=3, name="convB")
        x = _rand((1, 4, 4, 8, 8), 8)
        params = m.init(jax.random.PRNGKey(0), x)
        scales = quant.calibration_scales(
            lambda b: m.apply(params, b), [x, 2.0 * x], exclude=())
        assert set(scales) == {"convB"}
        expect = float(jnp.max(jnp.abs(2.0 * x))) / 127.0
        assert scales["convB"] == pytest.approx(expect, rel=1e-5)

    def test_exclusion(self):
        m = TorchConv3d(8, kernel=3, name="hm_out")
        x = _rand((1, 4, 4, 8, 8), 9)
        params = m.init(jax.random.PRNGKey(0), x)
        scales = quant.calibration_scales(lambda b: m.apply(params, b), [x])
        assert scales == {}  # DEFAULT_EXCLUDE filters *_out convs


@pytest.fixture(scope="module")
def tiny_asm(tmp_path_factory):
    cfg_path = tmp_path_factory.mktemp("exp_cfg") / "tiny.py"
    cfg_path.write_text(CONFIG_TEMPLATE.format(root="/nonexistent",
                                               roi=TINY_ROI))
    asm = assemble(Config.fromfile(str(cfg_path)))
    opt = adam_one_cycle(lambda s: 1e-3, None, weight_decay=0.0,
                         grad_clip_norm=None)
    state = create_train_state(asm.model, opt, asm.example_input(),
                               jax.random.PRNGKey(3))
    return asm, state


class TestEndToEnd:
    def test_calibrate_then_int8_predict(self, tiny_asm):
        asm, state = tiny_asm
        B = 2
        x = _rand((B, *asm.input_shape_zyxc), 10, 0.5) + 0.5
        scales = calibrate_predict(asm, state.params, [x])
        assert scales, "no conv scales recorded on the flagship graph"
        assert not any("_out" in k for k in scales)

        f32 = jax.jit(make_predict_fn(asm, state.params))(x)
        q8 = jax.jit(make_predict_fn(asm, state.params,
                                     int8_scales=scales))(x)

        f_l, q_l = jax.tree.leaves(f32), jax.tree.leaves(q8)
        assert len(f_l) == len(q_l) and len(q_l) > 0
        for a in q_l:
            assert bool(jnp.all(jnp.isfinite(a.astype(jnp.float32))))
        # the backbone features feeding the (float) head are quantized:
        # decoded scores track the float path closely on a GN-normalized net
        flat_f = jnp.concatenate([jnp.ravel(a).astype(jnp.float32) for a in f_l])
        flat_q = jnp.concatenate([jnp.ravel(a).astype(jnp.float32) for a in q_l])
        denom = float(jnp.max(jnp.abs(flat_f))) + 1e-6
        rel = float(jnp.max(jnp.abs(flat_f - flat_q))) / denom
        assert rel < 0.25, f"int8 predict diverged from f32: rel={rel:.3f}"

    def test_int8_export_roundtrip(self, tiny_asm, tmp_path):
        from rtpose_tpu.export import export_predict, load_predict
        asm, state = tiny_asm
        x = _rand((1, *asm.input_shape_zyxc), 11, 0.5)
        scales = calibrate_predict(asm, state.params, [x])
        blob = export_predict(asm, state.params, batch_size=1,
                              platforms=("cpu",), int8_scales=scales)
        live = jax.jit(make_predict_fn(asm, state.params,
                                       int8_scales=scales))(x)
        out = load_predict(blob)(x)
        for a, b in zip(jax.tree.leaves(live), jax.tree.leaves(out)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)


class TestInt8Resize:
    """Int8 trilinear resize (ops/interpolate.resize_trilinear_folded_int8)
    — the final-fuse resize matmuls join the int8 serving path (VERDICT r4
    #4: they were the largest unquantized MXU segment)."""

    def test_close_to_float(self):
        from rtpose_tpu.ops.interpolate import (resize_trilinear_folded,
                                                resize_trilinear_folded_int8)
        rng = np.random.default_rng(5)
        xf = jnp.asarray(rng.normal(size=(2, 4, 8, 5, 4 * 16))
                         .astype(np.float32))
        act_scale = float(np.abs(np.asarray(xf)).max()) / 127.0
        tgt = (8, 16, 40)
        f32 = resize_trilinear_folded(xf, tgt)
        q8 = resize_trilinear_folded_int8(xf, tgt, act_scale)
        assert q8.shape == f32.shape
        # error bound: ~1 input quantum of activation rounding (convex
        # combinations cannot amplify it) + <=1/127 relative weight rounding
        err = np.abs(np.asarray(q8, np.float32) - np.asarray(f32, np.float32))
        assert err.max() <= 2.5 * act_scale, err.max() / act_scale

    def test_identity_sizes_passthrough_dtype(self):
        from rtpose_tpu.ops.interpolate import resize_trilinear_folded_int8
        xf = jnp.ones((1, 2, 2, 2, 8), jnp.bfloat16)
        out = resize_trilinear_folded_int8(xf, (2, 2, 8), 0.01)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(out, np.float32), 1.0)

    def test_resize_sites_opt_in_dispatch(self, tiny_asm):
        """The HRNet final-fuse resizes consult the quant context but are
        EXCLUDED by default (DEFAULT_EXCLUDE `_resize`): the default int8
        path keeps r4 semantics.  Opting in (INT8_RESIZE_EXCLUDE, the
        export CLI's --int8_resize) calibrates the resize sites and keeps
        the backbone FEATURES close to float — end-output error on a
        random-init model is amplification-dominated, so the ship gate is
        the measured MPJPE delta on a trained checkpoint (BASELINE.md)."""
        asm, state = tiny_asm
        x = _rand((2, *asm.input_shape_zyxc), 11, 0.5) + 0.5
        default = calibrate_predict(asm, state.params, [x])
        assert not any(k.endswith("_resize") for k in default), sorted(default)

        scales = calibrate_predict(asm, state.params, [x],
                                   exclude=quant.INT8_RESIZE_EXCLUDE)
        resize_keys = [k for k in scales if k.endswith("_resize")]
        assert len(resize_keys) >= 2, sorted(scales)  # one per lower branch

        feat = jax.jit(lambda p, xx: asm.model.apply(
            p, xx, method="extract_feat"))(state.params, x)

        def feat_int8(p, xx):
            with quant.int8_mode(scales, exclude=quant.INT8_RESIZE_EXCLUDE):
                return jax.jit(lambda pp, xb: asm.model.apply(
                    pp, xb, method="extract_feat"))(p, xx)
        feat8 = feat_int8(state.params, x)
        a = np.asarray(feat, np.float32)
        b = np.asarray(feat8, np.float32)
        assert np.abs(a - b).max() / max(1.0, np.abs(a).max()) < 0.15


class TestQuantileCalibration:
    """Quantile-clipped calibration (the PTQ outlier defense): scales come
    from a quantile of |x| instead of absmax, so a few activation outliers
    cannot crush the useful int8 signal range."""

    def test_quantile_scale_below_absmax(self):
        conv = TorchConv3d(4, kernel=1, folded=False)
        x = np.ones((1, 2, 2, 2, 3), np.float32)
        x[0, 0, 0, 0, 0] = 1000.0                    # one outlier
        xj = jnp.asarray(x)
        p = conv.init(jax.random.PRNGKey(0), xj)

        def fwd(b):
            return conv.apply(p, b)

        absmax = quant.calibration_scales(fwd, [xj], exclude=())
        clipped = quant.calibration_scales(fwd, [xj], exclude=(),
                                           quantile=0.9)
        (k,) = absmax.keys()
        assert np.isclose(absmax[k], 1000.0 / 127.0, rtol=1e-5)
        assert clipped[k] < 2.0 / 127.0              # outlier clipped away

    def test_clipped_scales_saturate_not_explode(self):
        """Activations above the clip saturate at +-127 after quantization
        (the conv kernel clamps), so clipped calibration changes values
        only for the outlier tail."""
        w = _rand((1, 1, 1, 3, 4), 2)
        x = np.full((1, 2, 2, 2, 3), 0.5, np.float32)
        x[0, 0, 0, 0, :] = 50.0
        out = quant.conv3d_int8(jnp.asarray(x), w, None, 1,
                                act_scale=1.0 / 127.0,  # clip at |x|=1
                                folded=False, out_dtype=jnp.float32)
        ref = conv3d_naive(jnp.asarray(np.clip(x, -1.0, 1.0)), w, None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=0.05)
