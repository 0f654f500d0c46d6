"""Vision I/O helpers for the Qwen-VL prompt expander.

Capability parity with reference wan/utils/qwen_vl_utils.py:53-362:
`smart_resize` (factor-aligned resizing within pixel budgets),
`fetch_image` / `fetch_video` (local/array sources; remote URLs require
egress and raise clearly here), `process_vision_info` (message-tree
walker collecting image/video inputs).
"""

from __future__ import annotations

import base64
import io
import math
import os
from typing import Any, Dict, List, Optional, Tuple, Union

import numpy as np

IMAGE_FACTOR = 28
MIN_PIXELS = 4 * 28 * 28
MAX_PIXELS = 16384 * 28 * 28
MAX_RATIO = 200

VIDEO_MIN_PIXELS = 128 * 28 * 28
VIDEO_MAX_PIXELS = 768 * 28 * 28
FRAME_FACTOR = 2
FPS = 2.0
FPS_MIN_FRAMES = 4
FPS_MAX_FRAMES = 768


def round_by_factor(number: float, factor: int) -> int:
    return round(number / factor) * factor


def ceil_by_factor(number: float, factor: int) -> int:
    return math.ceil(number / factor) * factor


def floor_by_factor(number: float, factor: int) -> int:
    return math.floor(number / factor) * factor


def smart_resize(height: int, width: int, factor: int = IMAGE_FACTOR,
                 min_pixels: int = MIN_PIXELS,
                 max_pixels: int = MAX_PIXELS) -> Tuple[int, int]:
    """Factor-aligned (h, w) within the pixel budget, aspect preserved
    (reference qwen_vl_utils.py:53-81)."""
    if max(height, width) / min(height, width) > MAX_RATIO:
        raise ValueError(
            f"absolute aspect ratio must be smaller than {MAX_RATIO}")
    h_bar = max(factor, round_by_factor(height, factor))
    w_bar = max(factor, round_by_factor(width, factor))
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = floor_by_factor(height / beta, factor)
        w_bar = floor_by_factor(width / beta, factor)
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = ceil_by_factor(height * beta, factor)
        w_bar = ceil_by_factor(width * beta, factor)
    return h_bar, w_bar


def fetch_image(ele: Union[str, Dict[str, Any]],
                size_factor: int = IMAGE_FACTOR):
    """Load + smart-resize an image element (qwen_vl_utils.py:84-135).
    Sources: PIL image, local path, file://, data:image base64; http(s)
    raises (no egress in this environment)."""
    from PIL import Image
    if isinstance(ele, dict):
        image = ele.get("image", ele.get("image_url"))
    else:
        image = ele
    if isinstance(image, Image.Image):
        img = image
    elif isinstance(image, str):
        if image.startswith(("http://", "https://")):
            raise RuntimeError("remote image fetch requires network egress")
        if image.startswith("file://"):
            img = Image.open(image[7:])
        elif image.startswith("data:image"):
            _, b64 = image.split("base64,", 1)
            img = Image.open(io.BytesIO(base64.b64decode(b64)))
        else:
            img = Image.open(image)
    else:
        raise ValueError(f"unsupported image source: {type(image)}")
    img = img.convert("RGB")

    if isinstance(ele, dict) and "resized_height" in ele:
        h, w = (round_by_factor(ele["resized_height"], size_factor),
                round_by_factor(ele["resized_width"], size_factor))
    else:
        mn = ele.get("min_pixels", MIN_PIXELS) if isinstance(ele, dict) \
            else MIN_PIXELS
        mx = ele.get("max_pixels", MAX_PIXELS) if isinstance(ele, dict) \
            else MAX_PIXELS
        h, w = smart_resize(img.height, img.width, size_factor, mn, mx)
    return img.resize((w, h))


def smart_nframes(ele: Dict[str, Any], total_frames: int,
                  video_fps: float) -> int:
    """Frame count selection (qwen_vl_utils.py:226-270)."""
    if "nframes" in ele:
        return round_by_factor(ele["nframes"], FRAME_FACTOR)
    fps = ele.get("fps", FPS)
    min_frames = ceil_by_factor(ele.get("min_frames", FPS_MIN_FRAMES),
                                FRAME_FACTOR)
    max_frames = floor_by_factor(
        ele.get("max_frames", min(FPS_MAX_FRAMES, total_frames)),
        FRAME_FACTOR)
    nframes = total_frames / video_fps * fps
    nframes = min(max(nframes, min_frames), max_frames)
    nframes = floor_by_factor(nframes, FRAME_FACTOR)
    if not FRAME_FACTOR <= nframes <= total_frames:
        raise ValueError(f"invalid nframes {nframes}")
    return int(nframes)


def fetch_video(ele: Dict[str, Any], image_factor: int = IMAGE_FACTOR):
    """Load + subsample a local video via OpenCV → [T, H, W, 3] uint8
    (the reference's decord/torchvision readers are unavailable here)."""
    import cv2
    video = ele["video"]
    if isinstance(video, (list, tuple)):   # list of image frames
        return np.stack([np.asarray(fetch_image({"image": v},
                                                image_factor))
                         for v in video])
    cap = cv2.VideoCapture(str(video))
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    vfps = cap.get(cv2.CAP_PROP_FPS) or FPS
    n = smart_nframes(ele, total, vfps)
    idxs = np.linspace(0, total - 1, n).round().astype(int)
    frames = []
    for i in idxs:
        cap.set(cv2.CAP_PROP_POS_FRAMES, int(i))
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    if not frames:
        raise RuntimeError(f"no frames decoded from {video}")
    x = np.stack(frames)
    h, w = smart_resize(x.shape[1], x.shape[2], image_factor,
                        VIDEO_MIN_PIXELS, VIDEO_MAX_PIXELS)
    return np.stack([cv2.resize(f, (w, h)) for f in x])


def extract_vision_info(conversations) -> List[Dict]:
    """Walk a message tree for image/video elements
    (qwen_vl_utils.py:318-340)."""
    vision_infos = []
    if isinstance(conversations[0], dict):
        conversations = [conversations]
    for conv in conversations:
        for message in conv:
            content = message.get("content")
            if isinstance(content, list):
                for ele in content:
                    if isinstance(ele, dict) and (
                            "image" in ele or "image_url" in ele
                            or "video" in ele
                            or ele.get("type") in ("image", "image_url",
                                                   "video")):
                        vision_infos.append(ele)
    return vision_infos


def process_vision_info(conversations):
    """(image_inputs, video_inputs) (qwen_vl_utils.py:343-362)."""
    image_inputs, video_inputs = [], []
    for info in extract_vision_info(conversations):
        if "image" in info or "image_url" in info:
            image_inputs.append(fetch_image(info))
        elif "video" in info:
            video_inputs.append(fetch_video(info))
        else:
            raise ValueError("image, image_url or video required")
    return image_inputs or None, video_inputs or None
