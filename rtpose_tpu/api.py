"""High-level assembly: Config -> model modules + specs + loaders.

The single point that interprets the reference config schema (model /
assigner / test_cfg / data dicts) into the framework's pure-function pieces.
Used by tools/train.py, tools/test.py, bench.py and __graft_entry__.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

from .core.decode import DecodeSpec
from .core.targets import PoseTargetSpec
from .data.cruw_pose import CubeGeometry
from .models import CenterHead, build_detector
from .registry import DATASETS, build_from_cfg


@dataclasses.dataclass
class Assembly:
    model: Any                     # flax detector module
    head: Any                      # unbound CenterHead (loss/predict helpers)
    target_spec: PoseTargetSpec
    decode_spec: DecodeSpec
    input_shape_zyxc: Tuple[int, int, int, int]
    one_hm: bool
    model_cfg: Any = None          # the cfg.model dict the detector was built from
    sensor: str = "radar"          # 'radar' (dense cube) | 'lidar' (voxels)
    voxel_shape: Tuple[int, int, int] = None  # (V, P, F) for the lidar path
    # test_cfg double_flip: eval consumes the pipeline's {y,x,double_}flip_*
    # voxel sets (CenterPoint TTA — unflip + average + decode); lidar only
    tta_double_flip: bool = False

    @property
    def input_key(self):
        """Batch key holding the model input; None = the model consumes the
        voxel sub-dict (VoxelNet batch layout)."""
        return "rdr_tensor" if self.sensor == "radar" else None

    @property
    def sparse_head(self) -> bool:
        """Sparse reg-tower paths exist only for the dense radar detector,
        and are single-peak — multi-person configs use the dense step and
        the multi-peak decode instead.  The DCN head has no branch-routed
        sparse form (its deformable sampling needs the full feature map),
        so dcn configs run dense too."""
        return (self.one_hm and self.sensor == "radar"
                and self.target_spec.max_poses == 1
                and not self.model_cfg["pose_head"].get("dcn_head"))

    @property
    def multi_poses(self) -> int:
        """Top-P multi-person decode count (0 = single-person surface)."""
        if (self.one_hm and self.sensor == "radar"
                and self.target_spec.max_poses > 1):
            return self.target_spec.max_poses
        return 0

    def example_input(self, batch: int = 1):
        """A zeros model input for ``model.init`` / state templates."""
        import jax.numpy as jnp
        if self.sensor == "radar":
            return jnp.zeros((batch, *self.input_shape_zyxc), jnp.float32)
        V, P, F = self.voxel_shape
        return dict(
            voxels=jnp.zeros((batch, V, P, F), jnp.float32),
            num_points_per_voxel=jnp.zeros((batch, V), jnp.int32),
            coors=jnp.zeros((batch, V, 3), jnp.int32),
            num_voxels=jnp.zeros((batch,), jnp.int32),
        )


def serving_variant(asm: Assembly, final_dtype) -> Assembly:
    """Assembly copy whose head OUTPUT convs compute in ``final_dtype``
    (e.g. ``'bfloat16'``) — the serving-side form of the
    ``CenterHead.final_dtype`` knob.

    The override rebuilds the detector/head modules from a copied
    ``model_cfg``; parameters are untouched (conv ``dtype`` is a compute
    dtype — params stay f32), so trained checkpoints apply verbatim.
    Keeping the override OUT of the training configs is deliberate: basin
    selection in this model is decided by reassociation-level numerics
    (BASELINE.md round-3 GN-lowering bisect), so training keeps f32 head
    outputs while serving trades ~0.4% logit precision for the
    lane-starved f32 out-conv time.
    """
    import copy
    cfg = copy.deepcopy(asm.model_cfg)
    cfg["pose_head"]["final_dtype"] = final_dtype
    head_kwargs = {k: v for k, v in cfg["pose_head"].items() if k != "type"}
    return dataclasses.replace(asm, model=build_detector(cfg),
                               head=CenterHead(**head_kwargs), model_cfg=cfg)


def input_channels(dataset_cfg: Dict[str, Any]) -> int:
    """Channel count from RDR_TYPE (SURVEY.md §2.2 config table)."""
    rdr_type = dataset_cfg.get("RDR_TYPE", "zyx_real")
    d_bins = int(dataset_cfg.get("DOPPLER_BINS", 32))
    if "d" in rdr_type:
        return 2 * d_bins if "complex" in rdr_type else d_bins
    return 2 if "complex" in rdr_type else 1


def grid_from_cfg(dataset_cfg: Dict[str, Any]) -> Tuple[int, int, int]:
    roi = None
    if dataset_cfg["RDR_CUBE"].get("IS_CONSIDER_ROI", False):
        roi_type = dataset_cfg["RDR_CUBE"].get("ROI_TYPE",
                                               dataset_cfg["LABEL"]["ROI_TYPE"])
        roi = {k: list(v) for k, v in dataset_cfg["ROI"][roi_type].items()}
    return CubeGeometry.from_roi(roi).grid_zyx


def assemble(cfg) -> Assembly:
    """Build everything from a loaded Config (or plain dict-of-dicts)."""
    get = cfg.get if hasattr(cfg, "get") else cfg.__getitem__
    dataset_cfg = dict(get("DATASET"))
    model_cfg = dict(get("model"))
    assigner_cfg = dict(get("train_cfg")["assigner"])
    test_cfg = dict(get("test_cfg"))

    grid = grid_from_cfg(dataset_cfg)
    osf = tuple(int(f) for f in assigner_cfg.get("out_size_factor", (1, 1, 1)))
    feat_grid = tuple(g // f for g, f in zip(grid, osf))
    voxel = tuple(float(v) for v in dataset_cfg["RDR_CUBE"]["GRID_SIZE"])
    pc_min = tuple(float(v) for v in test_cfg["pc_range"])

    try:
        mode = get("assigner_mode", "one_hm")
    except TypeError:
        mode = "one_hm"
    tasks = [dict(t) for t in model_cfg["pose_head"]["tasks"]]
    num_classes = len(tasks[0]["class_names"])

    target_spec = PoseTargetSpec(
        grid_zyx=feat_grid,
        pc_range_min_xyz=pc_min,
        voxel_size_xyz=voxel,
        out_size_factor_zyx=osf,
        max_poses=int(assigner_cfg.get("max_poses", 1)),
        min_radius=int(assigner_cfg.get("min_radius", 2)),
        mode=mode,
        num_classes=num_classes,
    )
    decode_spec = DecodeSpec(
        grid_zyx=feat_grid,
        pc_range_min_xyz=pc_min,
        voxel_size_xyz=tuple(float(v) for v in test_cfg["voxel_size"]),
        out_size_factor_zyx=osf,
        score_threshold=float(test_cfg.get("score_threshold", 0.0)),
    )

    model = build_detector(model_cfg)
    head_kwargs = {k: v for k, v in model_cfg["pose_head"].items() if k != "type"}
    head = CenterHead(**head_kwargs)

    sensor = "lidar" if model_cfg.get("type") == "VoxelNet" else "radar"
    voxel_shape = None
    if sensor == "lidar":
        # fixed voxel-batch shapes from the train pipeline's Voxelization
        # stage (pose.py:52-142 schema) + the reader's feature width
        vox_cfg = next((dict(p.get("cfg", p)) for p in get("train_pipeline")
                        if p.get("type") == "Voxelization"), {})
        V = vox_cfg.get("max_voxel_num", 20000)
        if isinstance(V, (list, tuple)):
            V = V[0]
        P = int(vox_cfg.get("max_points_in_voxel", 35))
        F = int(model_cfg["reader"].get("num_input_features", 4))
        voxel_shape = (int(V), P, F)

    c_in = input_channels(dataset_cfg)
    return Assembly(model=model, head=head, target_spec=target_spec,
                    decode_spec=decode_spec,
                    input_shape_zyxc=(*grid, c_in),
                    one_hm=(mode == "one_hm"),
                    model_cfg=model_cfg,
                    sensor=sensor, voxel_shape=voxel_shape,
                    tta_double_flip=(sensor == "lidar"
                                     and bool(test_cfg.get("double_flip"))))


def build_dataset_from_cfg(data_cfg: Dict[str, Any], split: str,
                           max_poses: int = 1,
                           device_preprocess: bool = False):
    """Build a dataset from cfg.data.{train,val,test} (reference schema)."""
    dcfg = dict(data_cfg[split])
    dcfg.pop("class_names", None)
    dcfg["split"] = "train" if split == "train" else "test"
    dcfg["max_poses"] = max_poses
    if max_poses > 1:
        # multi-person configs: one SAMPLE per frame carrying all its
        # objects (the reference emits one sample per object and evaluates
        # only objects[0]; grouping is what makes max_poses>1 meaningful)
        dcfg["group_by_frame"] = True
    if device_preprocess:
        dcfg["device_preprocess"] = True
    return build_from_cfg(dcfg, DATASETS)
