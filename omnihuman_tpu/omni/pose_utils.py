"""Pose decoding utilities (UDP/DARK heatmap → keypoints).

Capability parity with reference Omnihuman/pose_utils.py:90-312:
`udp_decode` (Gaussian-blur modulated heatmap argmax + DARK-UDP Taylor
refinement via the local Hessian), UDP warp matrices, top-down affine
crops, and bbox NMS. numpy + cv2, host-side only.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np


def get_heatmap_maximum(heatmaps: np.ndarray
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """[K, H, W] → (locs [K, 2] xy, vals [K])."""
    k, h, w = heatmaps.shape
    flat = heatmaps.reshape(k, -1)
    idx = np.argmax(flat, axis=1)
    vals = flat[np.arange(k), idx]
    locs = np.stack([idx % w, idx // w], axis=-1).astype(np.float32)
    locs[vals <= 0] = -1
    return locs, vals


def gaussian_blur(heatmaps: np.ndarray, kernel: int = 11) -> np.ndarray:
    """Per-channel Gaussian blur preserving per-map maxima
    (pose_utils.py modulation step)."""
    import cv2
    border = (kernel - 1) // 2
    out = np.empty_like(heatmaps)
    for i, hm in enumerate(heatmaps):
        km = hm.max()
        pad = cv2.copyMakeBorder(hm, border, border, border, border,
                                 cv2.BORDER_CONSTANT, value=0)
        blur = cv2.GaussianBlur(pad, (kernel, kernel), 0)
        blur = blur[border:-border, border:-border]
        bm = blur.max()
        out[i] = blur * (km / bm) if bm > 0 else blur
    return out


def refine_keypoints_dark_udp(keypoints: np.ndarray, heatmaps: np.ndarray,
                              blur_kernel_size: int = 11) -> np.ndarray:
    """DARK-UDP refinement: log-heatmap Taylor expansion around the argmax
    using first/second derivatives (pose_utils.py:90-150)."""
    k, h, w = heatmaps.shape
    hms = gaussian_blur(heatmaps, blur_kernel_size)
    hms = np.clip(hms, 1e-3, 50.0)
    hms = np.log(hms)

    out = keypoints.copy()
    for i in range(k):
        x, y = int(out[i, 0]), int(out[i, 1])
        if not (1 < x < w - 2 and 1 < y < h - 2):
            continue
        hm = hms[i]
        dx = 0.5 * (hm[y, x + 1] - hm[y, x - 1])
        dy = 0.5 * (hm[y + 1, x] - hm[y - 1, x])
        dxx = 0.25 * (hm[y, x + 2] - 2 * hm[y, x] + hm[y, x - 2])
        dxy = 0.25 * (hm[y + 1, x + 1] - hm[y - 1, x + 1]
                      - hm[y + 1, x - 1] + hm[y - 1, x - 1])
        dyy = 0.25 * (hm[y + 2, x] - 2 * hm[y, x] + hm[y - 2, x])
        det = dxx * dyy - dxy * dxy
        if abs(det) > 1e-12:
            inv = np.array([[dyy, -dxy], [-dxy, dxx]]) / det
            offset = -inv @ np.array([dx, dy])
            offset = np.clip(offset, -1.0, 1.0)
            out[i, :2] += offset
    return out


def udp_decode(heatmaps: np.ndarray, input_size: Tuple[int, int],
               heatmap_size: Optional[Tuple[int, int]] = None,
               blur_kernel_size: int = 11
               ) -> Tuple[np.ndarray, np.ndarray]:
    """[K, H, W] → (keypoints [K, 2] in input pixels, scores [K])
    (pose_utils.py:153-180)."""
    k, h, w = heatmaps.shape
    locs, vals = get_heatmap_maximum(heatmaps)
    locs = refine_keypoints_dark_udp(locs, heatmaps, blur_kernel_size)
    # UDP: unbiased mapping heatmap → input space
    iw, ih = input_size
    scale = np.array([iw / max(w - 1, 1), ih / max(h - 1, 1)], np.float32)
    return locs * scale, vals


def get_udp_warp_matrix(center: np.ndarray, scale: np.ndarray, rot: float,
                        output_size: Tuple[int, int]) -> np.ndarray:
    """Unbiased affine warp (pose_utils.py:182-226)."""
    ow, oh = output_size
    rot_rad = math.radians(rot)
    cs, sn = math.cos(rot_rad), math.sin(rot_rad)
    sx = (ow - 1) / scale[0]
    sy = (oh - 1) / scale[1]
    m = np.zeros((2, 3), np.float32)
    m[0, 0] = cs * sx
    m[0, 1] = -sn * sx
    m[0, 2] = sx * (-cs * center[0] + sn * center[1] + 0.5 * scale[0])
    m[1, 0] = sn * sy
    m[1, 1] = cs * sy
    m[1, 2] = sy * (-sn * center[0] - cs * center[1] + 0.5 * scale[1])
    return m


def top_down_affine_transform(img: np.ndarray, bbox: np.ndarray,
                              output_size: Tuple[int, int] = (768, 1024),
                              padding: float = 1.25):
    """Crop a person bbox to the pose-model input (pose_utils.py:229-270)."""
    import cv2
    x1, y1, x2, y2 = bbox[:4]
    center = np.array([(x1 + x2) / 2, (y1 + y2) / 2], np.float32)
    w, h = (x2 - x1) * padding, (y2 - y1) * padding
    ow, oh = output_size
    aspect = ow / oh
    if w / max(h, 1e-6) > aspect:
        h = w / aspect
    else:
        w = h * aspect
    scale = np.array([w, h], np.float32)
    m = get_udp_warp_matrix(center, scale, 0.0, output_size)
    crop = cv2.warpAffine(img, m, output_size, flags=cv2.INTER_LINEAR)
    return crop, center, scale


def nms(dets: np.ndarray, thr: float) -> List[int]:
    """Greedy IoU NMS over [N, 5] (x1,y1,x2,y2,score)
    (pose_utils.py:273-312)."""
    if len(dets) == 0:
        return []
    x1, y1, x2, y2, scores = dets.T[:5]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        iw = np.maximum(0.0, xx2 - xx1 + 1)
        ih = np.maximum(0.0, yy2 - yy1 + 1)
        inter = iw * ih
        iou = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][iou <= thr]
    return keep
