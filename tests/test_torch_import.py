"""Torch-checkpoint import shim: reference-named state dicts map onto the
flax param tree with correct layout conversion."""

import numpy as np
import jax
import jax.numpy as jnp

from rtpose_tpu.engine.torch_import import build_name_map, import_torch_state_dict
from rtpose_tpu.models import build_detector
from rtpose_tpu.models.hrnet3d import MODEL_CONFIGS


def flagship_tiny():
    cfg = dict(
        type="RadarPoseNet",
        reader=dict(type="RadarFeatureNet"),
        backbone=dict(type="HRNet3D", backbone_cfg="hr_tiny_feat32_zyx_l4_in32",
                      final_conv_in=192, final_conv_out=128,
                      final_fuse="conat_conv"),
        pose_head=dict(type="CenterHead",
                       tasks=[dict(num_class=1, class_names=["Pelvis"])],
                       in_channels=128, share_conv_channel=128,
                       common_heads={"reg": (45, 2)}, weight=0.5,
                       code_weights=[1.0] * 45),
        neck=None)
    model = build_detector(cfg)
    x = jnp.zeros((1, 8, 16, 32, 32))
    return model, model.init(jax.random.PRNGKey(0), x), x


class TestTorchImport:
    def test_roundtrip_known_keys(self):
        model, params, x = flagship_tiny()
        hr_cfg = MODEL_CONFIGS["hr_tiny_feat32_zyx_l4_in32"]
        name_map = build_name_map(hr_cfg)

        rng = np.random.default_rng(0)
        # synthesize a torch state dict for a few known keys with the right
        # torch-side shapes
        # (no layer1.conv1 keys: with in==out channels both the reference and
        # this framework use an identity there)
        sd = {
            "backbone.backbone.layer1.conv2.groupnorm.weight": rng.normal(size=(32,)).astype(np.float32),
            "backbone.backbone.layer1.conv2.groupnorm.bias": rng.normal(size=(32,)).astype(np.float32),
            "backbone.backbone.layer1.conv2.conv.weight": rng.normal(size=(32, 32, 3, 3, 3)).astype(np.float32),
            "backbone.final_conv.weight": rng.normal(size=(128, 192, 1, 1, 1)).astype(np.float32),
            "backbone.final_conv.bias": rng.normal(size=(128,)).astype(np.float32),
            "pose_head.tasks.0.hm.2.bias": np.full((1,), -2.19, np.float32),
            "pose_head.tasks.0.reg.0.weight": rng.normal(size=(32, 128, 3, 3, 3)).astype(np.float32),
            "an.unknown.key": np.zeros(3, np.float32),
        }
        new_params, report = import_torch_state_dict(sd, params, hr_cfg)
        assert report["unexpected"] == ["an.unknown.key"]
        assert not report["mismatched"], report["mismatched"]
        assert len(report["loaded"]) == len(sd) - 1

        # layout conversion: torch (Co,Ci,kz,ky,kx) -> ours (kz,ky,kx,Ci,Co)
        got = new_params["params"]["backbone_m"]["backbone"]["layer1"]["conv2"]["TorchConv3d_0"]["kernel"]
        want = np.transpose(sd["backbone.backbone.layer1.conv2.conv.weight"],
                            (2, 3, 4, 1, 0))
        np.testing.assert_array_equal(np.asarray(got), want)
        hm_bias = new_params["params"]["head_m"]["task0"]["hm_out"]["bias"]
        np.testing.assert_allclose(np.asarray(hm_bias), -2.19)

    def test_name_map_covers_param_tree(self):
        """Every conv/GN param of the flagship model must be reachable from
        some torch key (no silent gaps in the mapping)."""
        model, params, x = flagship_tiny()
        hr_cfg = MODEL_CONFIGS["hr_tiny_feat32_zyx_l4_in32"]
        covered = {v[0] for v in build_name_map(hr_cfg).values()}
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        ours = {"/".join(str(getattr(p, "key", p)) for p in path).removeprefix("params/")
                for path, _ in flat}
        missing = sorted(ours - covered)
        assert not missing, missing[:10]

    def test_mismatched_shapes_tolerated(self):
        model, params, x = flagship_tiny()
        hr_cfg = MODEL_CONFIGS["hr_tiny_feat32_zyx_l4_in32"]
        sd = {"backbone.final_conv.bias": np.zeros((7,), np.float32)}
        new_params, report = import_torch_state_dict(sd, params, hr_cfg)
        assert len(report["mismatched"]) == 1
