"""KITTI-style mAP evaluation (det3d/datasets/utils/eval.py parity).

The reference carries a KITTI mAP evaluator as det3d inheritance, but it is
broken as shipped (``from det3d.ops.nms ...`` imports a module that does not
exist in the fork, eval.py:1-7).  This is a working clean-room equivalent of
the published KITTI protocol over this framework's rotated-box geometry
(:mod:`rtpose_tpu.ops.nms` Sutherland–Hodgman BEV clip):

* overlap matrices: axis-aligned image boxes, rotated BEV boxes, full 3D
  (reference ``image_box_overlap`` eval.py:282, ``bev_box_overlap`` :315,
  ``box3d_overlap`` :324-369), each with the reference's ``criterion``
  semantics (-1 IoU, 0 overlap/area_a, 1 overlap/area_b);
* greedy score-ordered matching with per-class GT filtering (reference
  ``compute_statistics_jit`` eval.py:144 / ``prepare_data`` :18);
* R40 interpolated AP: score thresholds at 40 recall positions computed
  from the matched-detection scores (official KITTI devkit protocol).

Boxes are PCDet-format ``(x, y, z, dx, dy, dz, heading)`` world boxes (the
same convention as :func:`rtpose_tpu.ops.nms.boxes_iou3d`); annotations are
per-frame dicts with ``name``/``location``/``dimensions``/``rotation_y``
(+ ``score`` for detections), the KITTI annotation schema.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

__all__ = [
    "image_box_overlap", "bev_box_overlap", "box3d_overlap",
    "annos_to_boxes", "compute_statistics", "eval_class",
    "get_official_eval_result",
]


def image_box_overlap(boxes: np.ndarray, query_boxes: np.ndarray,
                      criterion: int = -1) -> np.ndarray:
    """Axis-aligned 2D box overlap matrix, boxes ``(N, 4)`` as
    ``(x1, y1, x2, y2)`` (reference eval.py:282-312 semantics)."""
    boxes = np.asarray(boxes, np.float64)
    query_boxes = np.asarray(query_boxes, np.float64)
    lt = np.maximum(boxes[:, None, :2], query_boxes[None, :, :2])
    rb = np.minimum(boxes[:, None, 2:], query_boxes[None, :, 2:])
    wh = np.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.prod(boxes[:, 2:] - boxes[:, :2], axis=1)[:, None]
    area_b = np.prod(query_boxes[:, 2:] - query_boxes[:, :2], axis=1)[None, :]
    return _apply_criterion(inter, area_a, area_b, criterion)


def _apply_criterion(inter, area_a, area_b, criterion):
    if criterion == 0:
        denom = np.broadcast_to(area_a, inter.shape)
    elif criterion == 1:
        denom = np.broadcast_to(area_b, inter.shape)
    else:
        denom = area_a + area_b - inter
    return np.where(denom > 0, inter / np.maximum(denom, 1e-12), 0.0)


def bev_box_overlap(boxes: np.ndarray, qboxes: np.ndarray,
                    criterion: int = -1) -> np.ndarray:
    """Rotated BEV overlap matrix for (N, 7) PCDet boxes (reference
    eval.py:315-321; its rotate_iou kernel is the missing CUDA import)."""
    import jax.numpy as jnp

    from ..ops.nms import boxes_overlap_bev
    boxes = np.asarray(boxes, np.float32)
    qboxes = np.asarray(qboxes, np.float32)
    if len(boxes) == 0 or len(qboxes) == 0:
        return np.zeros((len(boxes), len(qboxes)), np.float32)
    inter = np.asarray(boxes_overlap_bev(jnp.asarray(boxes),
                                         jnp.asarray(qboxes)))
    area_a = (boxes[:, 3] * boxes[:, 4])[:, None]
    area_b = (qboxes[:, 3] * qboxes[:, 4])[None, :]
    return _apply_criterion(inter, area_a, area_b, criterion)


def box3d_overlap(boxes: np.ndarray, qboxes: np.ndarray,
                  criterion: int = -1) -> np.ndarray:
    """3D overlap matrix: BEV intersection x z-extent intersection
    (reference eval.py:324-369 with z_axis=2 / bottom-anchored PCDet
    convention: z is the box CENTER here, matching ops.nms.boxes_iou3d)."""
    boxes = np.asarray(boxes, np.float32)
    qboxes = np.asarray(qboxes, np.float32)
    if len(boxes) == 0 or len(qboxes) == 0:
        return np.zeros((len(boxes), len(qboxes)), np.float32)
    inter_bev = bev_box_overlap(boxes, qboxes, criterion=0) * \
        (boxes[:, 3] * boxes[:, 4])[:, None]          # back to raw area
    za0, za1 = boxes[:, 2] - boxes[:, 5] / 2, boxes[:, 2] + boxes[:, 5] / 2
    zb0, zb1 = qboxes[:, 2] - qboxes[:, 5] / 2, qboxes[:, 2] + qboxes[:, 5] / 2
    zi = np.clip(np.minimum(za1[:, None], zb1[None, :])
                 - np.maximum(za0[:, None], zb0[None, :]), 0.0, None)
    inter = inter_bev * zi
    vol_a = np.prod(boxes[:, 3:6], axis=1)[:, None]
    vol_b = np.prod(qboxes[:, 3:6], axis=1)[None, :]
    return _apply_criterion(inter, vol_a, vol_b, criterion)


def annos_to_boxes(anno: Dict) -> np.ndarray:
    """KITTI annotation dict -> (N, 7) PCDet boxes."""
    loc = np.asarray(anno["location"], np.float32).reshape(-1, 3)
    dims = np.asarray(anno["dimensions"], np.float32).reshape(-1, 3)
    rot = np.asarray(anno["rotation_y"], np.float32).reshape(-1)
    return np.concatenate([loc, dims, rot[:, None]], axis=1)


def compute_statistics(overlaps: np.ndarray, dt_scores: np.ndarray,
                       min_overlap: float, score_thresh: float = -np.inf):
    """Greedy matching for ONE frame and one class.

    ``overlaps``: (n_gt, n_dt) for the class-filtered boxes.  Detections are
    visited in descending score; each claims its best still-unclaimed GT
    with overlap >= min_overlap (reference compute_statistics_jit
    eval.py:144-279, without the don't-care/occlusion machinery KITTI
    difficulties need — the radar/lidar pose datasets have none).

    Returns (tp, fp, fn, matched_scores).
    """
    n_gt, n_dt = overlaps.shape
    keep = dt_scores >= score_thresh
    order = np.argsort(-dt_scores)
    gt_claimed = np.zeros(n_gt, bool)
    tp = fp = 0
    matched_scores = []
    for j in order:
        if not keep[j]:
            continue
        cand = np.where(~gt_claimed & (overlaps[:, j] >= min_overlap))[0]
        if len(cand):
            best = cand[np.argmax(overlaps[cand, j])]
            gt_claimed[best] = True
            tp += 1
            matched_scores.append(float(dt_scores[j]))
        else:
            fp += 1
    fn = int(n_gt - gt_claimed.sum())
    return tp, fp, fn, matched_scores


def _class_frame(anno: Dict, cls: str):
    names = np.asarray(anno["name"]).reshape(-1)
    sel = np.asarray([str(n) == cls for n in names], bool)
    boxes = annos_to_boxes(anno)[sel] if sel.any() else np.zeros((0, 7),
                                                                 np.float32)
    scores = (np.asarray(anno["score"], np.float32).reshape(-1)[sel]
              if "score" in anno else np.zeros(int(sel.sum()), np.float32))
    return boxes, scores


def eval_class(gt_annos: Sequence[Dict], dt_annos: Sequence[Dict],
               current_class: str, metric: str, min_overlap: float,
               n_sample_pts: int | None = None) -> float:
    """Interpolated AP for one class.

    ``metric``: 'bev' | '3d' | 'image'.  Protocol: one greedy matching pass
    per frame labels every detection TP/FP; the dataset-wide PR curve in
    descending score order gives AP as the area under the interpolated curve
    (all-point / VOC2010 scheme — exact at any dataset size).  Passing
    ``n_sample_pts`` instead averages interpolated precision over that many
    evenly spaced recall positions (the official KITTI devkit's R40 grid,
    which the reference's eval.py:144-279 follows; the grid variant assumes
    >= n_sample_pts matched detections and under-reads tiny datasets)."""
    assert len(gt_annos) == len(dt_annos), (len(gt_annos), len(dt_annos))
    overlap_fn = {"bev": bev_box_overlap, "3d": box3d_overlap,
                  "image": image_box_overlap}[metric]

    total_gt = 0
    rows: List[tuple] = []               # (score, is_tp) per detection
    for gt, dt in zip(gt_annos, dt_annos):
        gt_boxes, _ = _class_frame(gt, current_class)
        dt_boxes, dt_scores = _class_frame(dt, current_class)
        ov = overlap_fn(gt_boxes, dt_boxes)
        total_gt += len(gt_boxes)
        n_gt = ov.shape[0]
        gt_claimed = np.zeros(n_gt, bool)
        for j in np.argsort(-dt_scores):
            cand = (np.where(~gt_claimed & (ov[:, j] >= min_overlap))[0]
                    if n_gt else np.empty(0, np.int64))
            if len(cand):
                gt_claimed[cand[np.argmax(ov[cand, j])]] = True
                rows.append((float(dt_scores[j]), True))
            else:
                rows.append((float(dt_scores[j]), False))
    if total_gt == 0 or not rows:
        return 0.0

    rows.sort(key=lambda r: -r[0])
    tp_flags = np.asarray([r[1] for r in rows], np.float64)
    tp_cum = np.cumsum(tp_flags)
    fp_cum = np.cumsum(1.0 - tp_flags)
    recall = tp_cum / total_gt
    precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-12)
    # interpolation: precision at recall r = max precision at recall >= r
    precision = np.maximum.accumulate(precision[::-1])[::-1]

    if n_sample_pts:                     # KITTI recall-grid variant
        grid = np.linspace(0.0, 1.0, n_sample_pts + 1)[1:]
        p_at = np.where(grid <= recall[-1] + 1e-12,
                        np.interp(grid, recall, precision), 0.0)
        return float(p_at.mean())

    # all-point AUC over the step curve
    r_prev = np.concatenate([[0.0], recall[:-1]])
    return float(np.sum((recall - r_prev) * precision))


def get_official_eval_result(gt_annos: Sequence[Dict],
                             dt_annos: Sequence[Dict],
                             classes: Sequence[str],
                             min_overlaps: Dict[str, float] | float = 0.5,
                             metrics: Sequence[str] = ("bev", "3d")) -> Dict:
    """AP table {metric: {class: AP}} + a printable summary string."""
    out: Dict = {m: {} for m in metrics}
    lines = []
    for m in metrics:
        for cls in classes:
            mo = (min_overlaps.get(cls, 0.5)
                  if isinstance(min_overlaps, dict) else float(min_overlaps))
            ap = eval_class(gt_annos, dt_annos, cls, m, mo)
            out[m][cls] = ap
            lines.append(f"{cls} AP@{mo:.2f} ({m}): {100 * ap:.2f}")
    out["summary"] = "\n".join(lines)
    return out
