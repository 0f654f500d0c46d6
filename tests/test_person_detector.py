"""Heatmap-based person detector (VERDICT r4 item 6).

The reference crops people with mmdet RTMDet before pose extraction
(Omnihuman/detector_utils.py:49-123); mmcv is not in this image, so the
proposal stage is self-hosted: threshold + connected components over the
pose backbone's own full-frame heatmaps. Synthetic two-person frames pin
that (a) each person gets a box, (b) the processor's crop path differs
from full-frame processing, (c) blank frames fall back to full-frame.
"""

import numpy as np

from omnihuman_tpu.omni.keypoints import (
    HeatmapPersonDetector, SapiensKeypointProcessor, full_frame_detector)


class IntensityBackbone:
    """Fake pose backbone: heatmap response = normalized brightness
    (bright blobs = people). crop [H, W, 3] uint8 → [2, H/4, W/4]."""

    def __call__(self, crop):
        import cv2
        g = crop.mean(axis=-1).astype(np.float32) / 255.0
        hm = cv2.resize(g, (crop.shape[1] // 4, crop.shape[0] // 4))
        return np.stack([hm, 0.5 * hm])


def _two_person_frame():
    img = np.zeros((240, 320, 3), np.uint8)
    img[40:80, 40:80] = 180        # person A (dimmer)
    img[120:200, 200:280] = 250    # person B (brighter, bigger)
    return img


def test_two_person_boxes():
    img = _two_person_frame()
    det = HeatmapPersonDetector(IntensityBackbone(), input_size=(160, 128))
    boxes = det(img)
    assert boxes.shape[1] == 5 and len(boxes) == 2
    # every blob center is inside exactly one box
    for (cx, cy) in ((60, 60), (240, 160)):
        hits = [(b[0] <= cx <= b[2] and b[1] <= cy <= b[3])
                for b in boxes]
        assert sum(hits) == 1, (boxes, (cx, cy))
    # scores are sane and the brighter person scores higher
    by_x = boxes[np.argsort(boxes[:, 0])]
    assert 0 < by_x[0, 4] < by_x[1, 4] <= 1.0


def test_blank_frame_falls_back_to_full_frame():
    img = np.zeros((100, 150, 3), np.uint8)
    det = HeatmapPersonDetector(IntensityBackbone(), input_size=(160, 128))
    boxes = det(img)
    np.testing.assert_allclose(boxes, full_frame_detector(img))


def test_processor_crops_differ_from_full_frame():
    """Self-detected crop → keypoints concentrated on the winning person;
    must differ from the full-frame pipeline on a multi-person frame."""
    img = _two_person_frame()
    bb = IntensityBackbone()
    kw = dict(backbone=bb, num_keypoints=2, input_size=(160, 128),
              heatmap_size=(40, 32))
    proc_det = SapiensKeypointProcessor(**kw)                # self_detect
    proc_full = SapiensKeypointProcessor(self_detect=False, **kw)
    assert isinstance(proc_det.detector, HeatmapPersonDetector)
    assert proc_full.detector is full_frame_detector

    kp_det = proc_det.extract_keypoints(img)
    kp_full = proc_full.extract_keypoints(img)
    assert kp_det is not None and kp_full is not None
    assert np.all(np.isfinite(kp_det)) and np.all(np.isfinite(kp_full))
    assert not np.allclose(kp_det[:, :2], kp_full[:, :2], atol=1e-3)
    # the winning crop is person B (brighter): keypoints (normalized to
    # the frame) land inside B's box, not at the frame origin
    assert np.all(kp_det[:, 0] > 0.5) and np.all(kp_det[:, 1] > 0.4), kp_det
