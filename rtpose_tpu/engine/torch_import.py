"""Import PyTorch HRRadarPose checkpoints into rtpose_tpu params.

The reference saves ``{meta, state_dict, optimizer, scaler}`` .pth files
(``det3d/torchie/trainer/checkpoint.py:235-260``).  This shim maps the
reference's module names (read from the model definitions, e.g.
``backbone.backbone.layer1.conv2.conv.weight``,
``pose_head.tasks.0.hm.2.bias``) onto this framework's param tree, with the
layout conversions:

* Conv3d weights: torch (Co, Ci, kz, ky, kx) -> ours (kz, ky, kx, Ci, Co)
* GroupNorm weight/bias -> scale/bias
* tolerant matching: unexpected / missing / shape-mismatched keys are
  collected and reported instead of failing (load_state_dict parity,
  checkpoint.py:67-137).

No public reference weights exist (the repo ships none), so the mapping is
exercised by tests against a synthetically-built state dict following the
reference naming scheme.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _conv_w(t):  # torch OIDHW -> DHWIO
    return np.transpose(np.asarray(t), (2, 3, 4, 1, 0))


def _seq_gnconv(prefix: str) -> Dict[str, Tuple[str, Any]]:
    """nn.Sequential(GroupNorm, Conv3d[, ReLU]) -> GNConv params."""
    return {
        f"{prefix}.0.weight": ("GroupNorm8_0/scale", np.asarray),
        f"{prefix}.0.bias": ("GroupNorm8_0/bias", np.asarray),
        f"{prefix}.1.weight": ("TorchConv3d_0/kernel", _conv_w),
    }


def _single_conv(prefix: str, order: str = "gcr") -> Dict[str, Tuple[str, Any]]:
    """reference SingleConv 'gcr' (groupnorm + conv) -> our SingleConv."""
    return {
        f"{prefix}.groupnorm.weight": ("GroupNorm8_0/scale", np.asarray),
        f"{prefix}.groupnorm.bias": ("GroupNorm8_0/bias", np.asarray),
        f"{prefix}.conv.weight": ("TorchConv3d_0/kernel", _conv_w),
    }


def _resnet_block(prefix: str) -> Dict[str, Tuple[str, Any]]:
    m: Dict[str, Tuple[str, Any]] = {}
    m[f"{prefix}.conv1.weight"] = ("conv1/kernel", _conv_w)
    m[f"{prefix}.conv1.bias"] = ("conv1/bias", np.asarray)
    for k, v in _single_conv(f"{prefix}.conv2").items():
        m[k] = (f"conv2/{v[0]}", v[1])
    for k, v in _single_conv(f"{prefix}.conv3").items():
        m[k] = (f"conv3/{v[0]}", v[1])
    return m


def build_name_map(hr_cfg: Dict[str, Any]) -> Dict[str, Tuple[str, Any]]:
    """torch state_dict key -> (our param path, converter) for RadarPoseNet."""
    m: Dict[str, Tuple[str, Any]] = {}
    bb = "backbone_m/backbone"

    def add(tprefix, opath, table):
        for k, (sub, conv) in table.items():
            m[k] = (f"{opath}/{sub}", conv)

    # layer1
    add("backbone.backbone.layer1", f"{bb}/layer1", _resnet_block("backbone.backbone.layer1"))

    stages = [("stage2", 2), ("stage3", 3)]
    if "stage4" in hr_cfg:
        stages.append(("stage4", 4))

    # transitions: new-branch chains are Sequential(Sequential(GN, Conv, ReLU))
    prev_branches = 1
    for si, (sname, nb) in enumerate(stages, start=1):
        t = f"backbone.backbone.transition{si}"
        for b in range(nb):
            if b < prev_branches:
                # identity unless channel change (active configs: identity)
                continue
            n_chain = b + 1 - prev_branches
            for j in range(n_chain):
                add(f"{t}.{b}.{j}", f"{bb}/transition{si}_b{b}_j{j}",
                    _seq_gnconv(f"{t}.{b}.{j}"))
        prev_branches = nb

    # stage modules
    for si, (sname, nb) in enumerate(stages, start=1):
        scfg = hr_cfg[sname]
        for mod in range(scfg["num_modules"]):
            tp = f"backbone.backbone.{sname}.{mod}"
            op = f"{bb}/{sname}_m{mod}"
            for b in range(nb):
                for blk in range(scfg["num_blocks"][b]):
                    add(f"{tp}.branches.{b}.{blk}", f"{op}/branch{b}_block{blk}",
                        _resnet_block(f"{tp}.branches.{b}.{blk}"))
            # fuse layers
            for i in range(nb):
                for j in range(nb):
                    if j == i:
                        continue
                    if j > i:
                        add(f"{tp}.fuse_layers.{i}.{j}", f"{op}/fuse{i}_{j}",
                            _seq_gnconv(f"{tp}.fuse_layers.{i}.{j}"))
                    else:
                        for k in range(i - j):
                            add(f"{tp}.fuse_layers.{i}.{j}.{k}",
                                f"{op}/fuse{i}_{j}_k{k}",
                                _seq_gnconv(f"{tp}.fuse_layers.{i}.{j}.{k}"))

    # final fuse conv (wrapper): plain Conv3d
    m["backbone.final_conv.weight"] = ("backbone_m/final_conv_kernel", _conv_w)
    m["backbone.final_conv.bias"] = ("backbone_m/final_conv_bias", np.asarray)

    # head: SepHead towers — reference Sequential [Conv, ReLU, Conv]
    for head in ("reg", "hm"):
        base = f"pose_head.tasks.0.{head}"
        m[f"{base}.0.weight"] = (f"head_m/task0/{head}_conv0/kernel", _conv_w)
        m[f"{base}.0.bias"] = (f"head_m/task0/{head}_conv0/bias", np.asarray)
        m[f"{base}.2.weight"] = (f"head_m/task0/{head}_out/kernel", _conv_w)
        m[f"{base}.2.bias"] = (f"head_m/task0/{head}_out/bias", np.asarray)
    return m


def import_torch_state_dict(state_dict: Dict[str, Any], params: Any,
                            hr_cfg: Dict[str, Any]):
    """Map a torch state dict onto a params pytree.

    Returns (new_params, report) with report = dict(loaded, missing,
    unexpected, mismatched) — tolerant semantics like the reference's
    load_state_dict.
    """
    import jax

    name_map = build_name_map(hr_cfg)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    ours = {}
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        ours[key.removeprefix("params/")] = (path, leaf)

    new_leaves = {key: leaf for key, (path, leaf) in ours.items()}
    loaded, unexpected, mismatched = [], [], []
    for tkey, tval in state_dict.items():
        if tkey not in name_map:
            unexpected.append(tkey)
            continue
        okey, conv = name_map[tkey]
        if okey not in new_leaves:
            unexpected.append(tkey)
            continue
        arr = conv(tval)
        if tuple(arr.shape) != tuple(new_leaves[okey].shape):
            mismatched.append((tkey, tuple(arr.shape),
                               tuple(new_leaves[okey].shape)))
            continue
        new_leaves[okey] = np.asarray(arr, dtype=np.asarray(new_leaves[okey]).dtype)
        loaded.append(okey)
    missing = [k for k in ours if k not in loaded]

    out = jax.tree_util.tree_unflatten(
        treedef, [new_leaves[key] for key, _ in ours.items()])
    return out, dict(loaded=loaded, missing=missing, unexpected=unexpected,
                     mismatched=mismatched)
