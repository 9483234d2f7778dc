"""Folded-layout network mode: numerical equivalence with the naive layout
on identical parameters (X=32 grid so all 4 branch resolutions fold)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rtpose_tpu.models import HRNet3D, CenterHead


GRID = (8, 16, 32)  # (Z, Y, X): X % 32 == 0 -> folded mode engages


def build(fold):
    bb = HRNet3D(backbone_cfg="hr_tiny_feat32_zyx_l4_in32",
                 final_conv_in=192, final_conv_out=128,
                 final_fuse="conat_conv", fold_x=fold)
    head = CenterHead(tasks=[dict(num_class=1, class_names=["Pelvis"])],
                      in_channels=128, share_conv_channel=128,
                      common_heads={"reg": (45, 2)}, weight=0.5,
                      code_weights=[1.0] * 45, fold_x=fold)
    return bb, head


class TestFoldedEquivalence:
    def test_backbone_head_match(self):
        Z, Y, X = GRID
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, Z, Y, X, 32)).astype(np.float32))

        bb_n, head_n = build(False)
        bb_f, head_f = build(True)
        p_bb = bb_n.init(jax.random.PRNGKey(0), x)
        feat_n = bb_n.apply(p_bb, x)
        feat_f = bb_f.apply(p_bb, x)  # same params, folded layout
        assert feat_n.shape == (2, Z, Y, X, 128)
        assert feat_f.shape == (2, Z, Y, X // 4, 512)

        from rtpose_tpu.ops.fold_conv import unfold_x
        # ~30 conv/GN layers of f32 accumulation-order noise: ~1e-3 absolute
        np.testing.assert_allclose(np.asarray(unfold_x(feat_f)),
                                   np.asarray(feat_n), rtol=5e-3, atol=5e-3)

        p_h = head_n.init(jax.random.PRNGKey(1), feat_n)
        out_n = head_n.apply(p_h, feat_n)
        out_f = head_f.apply(p_h, feat_f)
        assert out_f[0]["hm"].shape == out_n[0]["hm"].shape == (2, Z, Y, X, 1)
        np.testing.assert_allclose(np.asarray(out_f[0]["hm"]),
                                   np.asarray(out_n[0]["hm"]),
                                   rtol=5e-3, atol=5e-3)
        np.testing.assert_allclose(np.asarray(out_f[0]["reg"]),
                                   np.asarray(out_n[0]["reg"]),
                                   rtol=5e-3, atol=5e-3)

    def test_param_trees_identical(self):
        Z, Y, X = GRID
        x = jnp.zeros((1, Z, Y, X, 32))
        bb_n, _ = build(False)
        bb_f, _ = build(True)
        p_n = bb_n.init(jax.random.PRNGKey(0), x)
        p_f = bb_f.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(p_n) == jax.tree_util.tree_structure(p_f)
        for a, b in zip(jax.tree.leaves(p_n), jax.tree.leaves(p_f)):
            assert a.shape == b.shape

    def test_small_grid_falls_back(self):
        # X=16 cannot keep all branches foldable -> naive layout output
        bb_f, _ = build(True)
        x = jnp.zeros((1, 8, 16, 16, 32))
        p = bb_f.init(jax.random.PRNGKey(0), x)
        out = bb_f.apply(p, x)
        assert out.shape == (1, 8, 16, 16, 128)

    @pytest.mark.slow
    def test_structural_exactness_f64(self):
        """In float64 the folded and naive networks must agree to ~1e-12
        (forward AND gradients) — the two layouts are the same math.  The
        f32 production paths differ only by accumulation-order noise, which
        ReLU gates amplify chaotically; exactness is the meaningful check."""
        from rtpose_tpu.ops.fold_conv import unfold_x
        with jax.enable_x64(True):
            Z, Y, X = GRID
            rng = np.random.default_rng(1)
            x = jnp.asarray(rng.normal(size=(1, Z, Y, X, 32)))
            bb_n, _ = build(False)
            bb_f, _ = build(True)
            p = bb_n.init(jax.random.PRNGKey(0), x)
            p = jax.tree.map(lambda a: a.astype(jnp.float64), p)

            f_n = bb_n.apply(p, x)
            f_f = unfold_x(bb_f.apply(p, x))
            np.testing.assert_allclose(np.asarray(f_f), np.asarray(f_n),
                                       rtol=1e-9, atol=1e-9)

            g_n = jax.grad(lambda p: jnp.sum(bb_n.apply(p, x) ** 2))(p)
            g_f = jax.grad(lambda p: jnp.sum(unfold_x(bb_f.apply(p, x)) ** 2))(p)
            for a, b in zip(jax.tree.leaves(g_n), jax.tree.leaves(g_f)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-7, atol=1e-7)
