"""Sapiens-308 keypoint processor + person-detector glue (host-side).

Capability parity with reference Omnihuman/keypoint_processor.py:16-235
(`SapiensKeypointProcessor`) and detector_utils.py:25-158: TorchScript
Sapiens-Goliath pose backbone (308 keypoints) with optional person
detector; crop→(768,1024)→heatmaps→UDP decode→normalized keypoints;
Gaussian heatmap synthesis.

The Sapiens .pt2 model and mmdet RTMDet are external artifacts; both are
pluggable here. Without them, `extract_keypoints` returns None (the
dataset then tracks LANDMARK_DETECTION_FAILED and degrades, matching the
reference's failure path). The detector protocol accepts any callable
image → [N, 5] boxes; a trivial full-frame detector is the default
(reference also falls back to full-frame when detector is absent,
keypoint_processor.py:96-103).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import numpy as np

from omnihuman_tpu.omni.pose_utils import (
    nms, top_down_affine_transform, udp_decode)
from omnihuman_tpu.utils.logging import logger


def full_frame_detector(image: np.ndarray) -> np.ndarray:
    """Fallback detector: the whole frame is one 'person' box."""
    h, w = image.shape[:2]
    return np.array([[0, 0, w - 1, h - 1, 1.0]], np.float32)


class HeatmapPersonDetector:
    """Person-bbox proposals from the pose backbone's OWN heatmaps.

    Replaces the reference's mmdet RTMDet person detector
    (Omnihuman/detector_utils.py:49-123) without extra weights: run the
    pose backbone once on the resized FULL frame, threshold the
    max-over-keypoints response, connected-component the mask, and emit
    one padded box per component (score = mean response inside it).
    `SapiensKeypointProcessor` then crops the winning box and re-runs
    the backbone on the crop — the same two-stage top-down pipeline as
    the reference, with the proposal stage self-hosted.

    Detector protocol: image [H, W, 3] uint8 → [N, 5] (x1,y1,x2,y2,s).
    Falls back to the full frame when nothing clears the threshold
    (keypoint_processor.py:96-103 does the same without a detector).
    """

    def __init__(self, backbone: Callable,
                 input_size: Tuple[int, int] = (768, 1024),
                 threshold: float = 0.3,
                 min_area_frac: float = 1e-3,
                 pad_frac: float = 0.10):
        self.backbone = backbone
        self.input_size = input_size          # (w, h) backbone input
        self.threshold = threshold
        self.min_area_frac = min_area_frac
        self.pad_frac = pad_frac

    def __call__(self, image: np.ndarray) -> np.ndarray:
        import cv2

        h0, w0 = image.shape[:2]
        frame = cv2.resize(image, self.input_size)        # dsize=(w, h)
        hm = np.asarray(self.backbone(frame), np.float32)  # [K, hh, ww]
        resp = hm.max(axis=0)
        hh, ww = resp.shape
        peak = float(resp.max())
        if not np.isfinite(peak) or peak < self.threshold:
            return full_frame_detector(image)
        mask = (resp >= self.threshold).astype(np.uint8)
        n, labels, stats, _ = cv2.connectedComponentsWithStats(mask)
        sx, sy = w0 / ww, h0 / hh                 # heatmap px → frame px
        boxes = []
        min_area = self.min_area_frac * hh * ww
        for i in range(1, n):                     # 0 is background
            x, y, bw, bh, area = stats[i]
            if area < min_area:
                continue
            score = float(np.clip(resp[labels == i].mean(), 0.0, 1.0))
            px, py = self.pad_frac * bw, self.pad_frac * bh
            boxes.append([
                max(0.0, (x - px) * sx), max(0.0, (y - py) * sy),
                min(w0 - 1.0, (x + bw + px) * sx),
                min(h0 - 1.0, (y + bh + py) * sy), score])
        if not boxes:
            return full_frame_detector(image)
        return np.asarray(boxes, np.float32)


class TorchScriptPoseBackbone:
    """Wraps a TorchScript Sapiens model (torch CPU is available here)."""

    def __init__(self, model_path: str, device: str = "cpu"):
        import torch
        self.torch = torch
        self.model = torch.jit.load(model_path, map_location=device)
        self.model.eval()
        self.device = device

    def __call__(self, crop: np.ndarray) -> np.ndarray:
        """[H, W, 3] uint8 crop → [K, h, w] heatmaps.

        Normalization matches the reference transform
        (keypoint_processor.py:43-49): mean 123.5/116.5/103.5,
        std 58.5/57.0/57.5 on the 0-255 scale."""
        torch = self.torch
        from omnihuman_tpu.omni.sapiens import SAPIENS_MEAN, SAPIENS_STD
        x = torch.from_numpy(crop.astype(np.float32))
        x = (x - torch.tensor(SAPIENS_MEAN)) / torch.tensor(SAPIENS_STD)
        x = x.permute(2, 0, 1)[None].to(self.device)
        with torch.no_grad():
            out = self.model(x)
        return out[0].cpu().numpy()


class SapiensKeypointProcessor:
    """308-keypoint extraction pipeline."""

    def __init__(
        self,
        checkpoint_path: Optional[str] = None,
        detector: Optional[Callable] = None,
        num_keypoints: int = 308,
        input_size: Tuple[int, int] = (768, 1024),
        heatmap_size: Tuple[int, int] = (192, 256),
        nms_threshold: float = 0.3,
        det_score_threshold: float = 0.3,
        backbone: Optional[Callable] = None,
        self_detect: bool = True,
    ):
        """checkpoint_path routing: ``*.pt2`` → TorchScript wrapper
        (the reference's artifact); anything else → the native JAX
        Sapiens backbone (omni/sapiens.py), converted from the torch
        state dict. `backbone` accepts any callable crop → [K, h, w].

        self_detect: with a backbone and no explicit detector, propose
        person boxes from the backbone's own full-frame heatmaps
        (HeatmapPersonDetector) instead of the whole frame — the
        two-stage top-down pipeline the reference runs via mmdet RTMDet
        (detector_utils.py:49-123)."""
        self.num_keypoints = num_keypoints
        self.input_size = input_size
        self.heatmap_size = heatmap_size
        self.nms_threshold = nms_threshold
        self.det_score_threshold = det_score_threshold
        self.backbone = backbone
        if backbone is None and checkpoint_path:
            try:
                if checkpoint_path.endswith(".pt2"):
                    self.backbone = TorchScriptPoseBackbone(checkpoint_path)
                else:
                    from omnihuman_tpu.omni.sapiens import JaxSapiensBackbone
                    self.backbone = JaxSapiensBackbone(checkpoint_path)
                logger.info(f"Loaded Sapiens backbone: {checkpoint_path}")
            except Exception as e:
                logger.warning(f"Sapiens load failed ({e}); "
                               "keypoint extraction disabled")
        if detector is not None:
            self.detector = detector
        elif self_detect and self.backbone is not None:
            self.detector = HeatmapPersonDetector(self.backbone,
                                                  input_size=input_size)
        else:
            self.detector = full_frame_detector

    def detect_person(self, image: np.ndarray) -> Optional[np.ndarray]:
        """Best person bbox after score filter + NMS
        (detector_utils.py:49-158)."""
        dets = np.asarray(self.detector(image), np.float32)
        if dets.ndim != 2 or len(dets) == 0:
            return None
        dets = dets[dets[:, 4] >= self.det_score_threshold]
        if len(dets) == 0:
            return None
        keep = nms(dets, self.nms_threshold)
        return dets[keep[0]] if keep else None

    def extract_keypoints(self, image: np.ndarray
                          ) -> Optional[np.ndarray]:
        """[H, W, 3] uint8 frame → [K, 3] (x, y, conf) normalized to the
        frame, or None on failure (keypoint_processor.py:85-153)."""
        if self.backbone is None:
            return None
        try:
            bbox = self.detect_person(image)
            if bbox is None:
                return None
            crop, center, scale = top_down_affine_transform(
                image, bbox, self.input_size)
            heatmaps = self.backbone(crop)                 # [K, h, w]
            kp_in, scores = udp_decode(heatmaps, self.input_size)
            # map crop coordinates back to the original frame
            kp = kp_in / np.array(self.input_size, np.float32)  # 0..1 crop
            kp = kp * scale[None, :] + (center[None, :]
                                        - 0.5 * scale[None, :])
            h, w = image.shape[:2]
            kp_norm = kp / np.array([w, h], np.float32)
            out = np.concatenate(
                [kp_norm, scores[:, None]], axis=-1).astype(np.float32)
            if out.shape[0] != self.num_keypoints:
                pad = np.zeros((self.num_keypoints, 3), np.float32)
                pad[:out.shape[0]] = out[:self.num_keypoints]
                out = pad
            return out
        except Exception as e:
            logger.error(f"keypoint extraction failed: {e}")
            return None

    def generate_heatmaps(self, keypoints: np.ndarray,
                          heatmap_size: Optional[Tuple[int, int]] = None,
                          sigma: float = 2.0) -> np.ndarray:
        """[K, 3] → [K, H, W] (keypoint_processor.py:157-192)."""
        from omnihuman_tpu.omni.dataset import generate_heatmaps
        hs = heatmap_size or (self.heatmap_size[1], self.heatmap_size[0])
        return generate_heatmaps(keypoints, hs, sigma=sigma)
