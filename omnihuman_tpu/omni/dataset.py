"""OmniHuman dataset pipeline (host-side data plane).

Capability parity with reference Omnihuman/omnihuman_dataset.py:37-1260
(`OmniHumanDataset`):
  - recursive *.mp4 scan; audio-stream probing with a JSON status cache
    (":149-259"); wav extraction cache (":432-514");
  - auto-generated annotations.json from videos (":315-382");
  - quality/motion-score + condition-availability filtering (":384-408");
  - per-sample random start-frame windowing (":946-949");
  - keypoint pre-extraction with .npy cache (":559-667") through a
    pluggable KeypointProcessor;
  - Gaussian heatmaps from keypoints (":838-881");
  - zero-filled empty-sample fallback on any failure (":1056-1069") with
    ProblematicVideoTracker events;
  - __getitem__ → {frames [C,T,H,W], conditions {audio, pose, text,
    reference}, metadata} as numpy arrays (device-ready, no torch).

Environment adaptations (this image has no ffmpeg/ffprobe binaries,
no torchaudio/librosa):
  - video IO via OpenCV (bundled ffmpeg);
  - audio probing/extraction degrade gracefully: a sidecar .wav next to
    the video is used when present, else a NO_AUDIO event is tracked —
    same observable behaviour as the reference on ffprobe failure;
  - audio features: the reference ships torch.randn placeholders
    (":813-816", SURVEY §2.8). Here the default is a REAL numpy log-mel
    extractor (AudioFeatureExtractor), with a wav2vec hook point
    (`feature_fn=`) matching the spec (README.md:124-128).
"""

from __future__ import annotations

import json
import os
import wave
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from omnihuman_tpu.omni.tracker import (
    ProblematicVideoTracker, VideoEvent)
from omnihuman_tpu.utils.logging import logger


# ---------------------------------------------------------------------------
# audio features


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Mono float32 waveform + sample rate via stdlib wave."""
    with wave.open(str(path), "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
        width = w.getsampwidth()
        ch = w.getnchannels()
    if width == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    else:
        x = np.frombuffer(raw, np.uint8).astype(np.float32) / 128.0 - 1.0
    if ch > 1:
        x = x.reshape(-1, ch).mean(-1)
    return x, sr


class AudioFeatureExtractor:
    """Log-mel feature extractor (numpy) aligned to video frames.

    Replaces the reference's random-tensor placeholder
    (omnihuman_dataset.py:813-816). Produces [T_frames, dim] features:
    one feature row per video frame, mel spectrogram averaged over the
    frame's audio span, tiled/truncated to `dim`.
    """

    def __init__(self, dim: int = 1024, n_mels: int = 128,
                 n_fft: int = 512, fps: float = 16.0):
        self.dim = dim
        self.n_mels = n_mels
        self.n_fft = n_fft
        self.fps = fps

    def _mel_filter(self, sr: int) -> np.ndarray:
        n_bins = self.n_fft // 2 + 1
        f = np.linspace(0, sr / 2, n_bins)
        mel_pts = np.linspace(self._hz2mel(0), self._hz2mel(sr / 2),
                              self.n_mels + 2)
        hz_pts = self._mel2hz(mel_pts)
        fb = np.zeros((self.n_mels, n_bins), np.float32)
        for m in range(self.n_mels):
            lo, ce, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
            up = (f - lo) / max(ce - lo, 1e-8)
            down = (hi - f) / max(hi - ce, 1e-8)
            fb[m] = np.clip(np.minimum(up, down), 0, 1)
        return fb

    @staticmethod
    def _hz2mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)

    @staticmethod
    def _mel2hz(m):
        return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)

    def __call__(self, waveform: np.ndarray, sr: int,
                 num_frames: int) -> np.ndarray:
        hop = self.n_fft // 2
        if len(waveform) < self.n_fft:
            waveform = np.pad(waveform, (0, self.n_fft - len(waveform)))
        win = np.hanning(self.n_fft)
        starts = np.arange(0, len(waveform) - self.n_fft + 1, hop)
        frames = np.stack([waveform[s:s + self.n_fft] * win for s in starts])
        spec = np.abs(np.fft.rfft(frames, axis=-1)) ** 2       # [S, bins]
        mel = np.log(spec @ self._mel_filter(sr).T + 1e-6)     # [S, mels]

        # pool spectrogram rows into per-video-frame features
        out = np.zeros((num_frames, self.dim), np.float32)
        spf = max(1, int(round(sr / self.fps / hop)))          # spec/frame
        reps = int(np.ceil(self.dim / self.n_mels))
        for t in range(num_frames):
            seg = mel[t * spf:(t + 1) * spf]
            row = seg.mean(0) if len(seg) else np.zeros(self.n_mels)
            out[t] = np.tile(row, reps)[:self.dim]
        return out


# ---------------------------------------------------------------------------
# heatmaps (reference omnihuman_dataset.py:838-881)


def generate_heatmaps(keypoints: np.ndarray, heatmap_size: Tuple[int, int],
                      sigma: float = 2.0,
                      conf_threshold: float = 0.1) -> np.ndarray:
    """[K, 3] normalized keypoints (x, y, conf) → [K, H, W] Gaussians."""
    K = keypoints.shape[0]
    H, W = heatmap_size
    gy, gx = np.mgrid[0:H, 0:W].astype(np.float32)
    hm = np.zeros((K, H, W), np.float32)
    for k in range(K):
        x, y, c = keypoints[k]
        if c <= conf_threshold:
            continue
        xs, ys = int(x * W), int(y * H)
        if 0 <= xs < W and 0 <= ys < H:
            d2 = (gx - xs) ** 2 + (gy - ys) ** 2
            hm[k] = np.exp(-d2 / (2.0 * sigma ** 2))
    return hm


# ---------------------------------------------------------------------------
# dataset


class OmniHumanDataset:
    """Map-style dataset over a directory of videos."""

    def __init__(
        self,
        data_dir: str,
        condition_ratios: Optional[Dict[str, float]] = None,
        num_frames: int = 49,
        frame_size: Tuple[int, int] = (256, 256),
        num_keypoints: int = 308,
        heatmap_size: Tuple[int, int] = (64, 64),
        audio_dim: int = 1024,
        fps: float = 16.0,
        cache_dir: Optional[str] = None,
        keypoint_processor=None,
        audio_feature_fn: Optional[Callable] = None,
        tracker: Optional[ProblematicVideoTracker] = None,
        min_quality_score: float = 0.0,
        min_motion_score: float = 0.0,
        seed: int = 0,
    ):
        self.data_dir = Path(data_dir)
        self.condition_ratios = condition_ratios or {
            "text": 1.0, "reference": 1.0, "audio": 0.0, "pose": 0.0}
        self.num_frames = num_frames
        self.frame_size = frame_size
        self.num_keypoints = num_keypoints
        self.heatmap_size = heatmap_size
        self.audio_dim = audio_dim
        self.fps = fps
        self.cache_dir = Path(cache_dir or (self.data_dir / ".omni_cache"))
        self.cache_dir.mkdir(parents=True, exist_ok=True)
        self.keypoint_processor = keypoint_processor
        self.audio_feature_fn = audio_feature_fn or AudioFeatureExtractor(
            dim=audio_dim, fps=fps)
        self.tracker = tracker
        self.rng = np.random.default_rng(seed)

        self.videos = sorted(self.data_dir.rglob("*.mp4"))
        self.annotations = self._load_or_create_annotations()
        self.filtered_data = self._filter(min_quality_score,
                                          min_motion_score)
        logger.info(f"OmniHumanDataset: {len(self.videos)} videos, "
                    f"{len(self.filtered_data)} after filtering")

    # -- probing / annotations ----------------------------------------------

    def _audio_status(self, video: Path) -> bool:
        """Audio availability with a JSON cache (":149-259"). Without
        ffprobe we look for a sidecar .wav."""
        cache = self.cache_dir / "audio_status.json"
        status = {}
        if cache.exists():
            status = json.loads(cache.read_text())
        key = str(video)
        if key not in status:
            has = video.with_suffix(".wav").exists()
            if not has and self.tracker:
                self.tracker.track(key, VideoEvent.NO_AUDIO,
                                   {"reason": "no sidecar wav / no ffprobe"})
            status[key] = has
            cache.write_text(json.dumps(status))
        return status[key]

    def _video_meta(self, video: Path) -> Dict[str, Any]:
        import cv2
        cap = cv2.VideoCapture(str(video))
        meta = {
            "total_frames": int(cap.get(cv2.CAP_PROP_FRAME_COUNT)),
            "fps": cap.get(cv2.CAP_PROP_FPS) or self.fps,
            "width": int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            "height": int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
        }
        cap.release()
        return meta

    def _load_or_create_annotations(self) -> List[Dict]:
        """annotations.json auto-generation (":315-382")."""
        path = self.data_dir / "annotations.json"
        if path.exists():
            return json.loads(path.read_text())
        ann = []
        for v in self.videos:
            try:
                meta = self._video_meta(v)
                if meta["total_frames"] < self.num_frames:
                    if self.tracker:
                        self.tracker.track(str(v),
                                           VideoEvent.VIDEO_TOO_SHORT,
                                           meta)
                ann.append({
                    "relative_path": str(v.relative_to(self.data_dir)),
                    "video_name": v.name,
                    "text": v.stem.replace("_", " "),
                    "has_audio": self._audio_status(v),
                    "has_pose": self.keypoint_processor is not None,
                    "quality_score": 1.0,
                    "motion_score": 1.0,
                    **meta,
                })
            except Exception as e:
                if self.tracker:
                    self.tracker.track(str(v), VideoEvent.PROCESSING_ERROR,
                                       {"error": str(e)})
        if ann:
            path.write_text(json.dumps(ann, indent=1))
        return ann

    def _filter(self, min_q: float, min_m: float) -> List[Dict]:
        """quality/motion + condition availability (":384-408")."""
        out = []
        for item in self.annotations:
            if item.get("quality_score", 1.0) < min_q:
                continue
            if item.get("motion_score", 1.0) < min_m:
                continue
            if (self.condition_ratios.get("audio", 0) >= 1.0
                    and not item.get("has_audio", False)):
                continue
            out.append(item)
        return out

    # -- loading --------------------------------------------------------

    def _load_frames(self, video: Path, start: int) -> np.ndarray:
        """[C, T, H, W] float32 in [-1, 1]."""
        import cv2
        cap = cv2.VideoCapture(str(video))
        cap.set(cv2.CAP_PROP_POS_FRAMES, start)
        frames = []
        for _ in range(self.num_frames):
            ok, frame = cap.read()
            if not ok:
                break
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            frame = cv2.resize(frame, self.frame_size[::-1])
            frames.append(frame)
        cap.release()
        if not frames:
            raise RuntimeError("no frames decoded")
        while len(frames) < self.num_frames:   # repeat-pad short clips
            frames.append(frames[-1])
        x = np.stack(frames).astype(np.float32) / 127.5 - 1.0  # [T,H,W,C]
        return x.transpose(3, 0, 1, 2)

    def _load_audio_features(self, video: Path) -> np.ndarray:
        wav_path = video.with_suffix(".wav")
        cache = (self.cache_dir
                 / f"{video.stem}_audio_{self.num_frames}.npy")
        if cache.exists():
            return np.load(cache)
        waveform, sr = read_wav(str(wav_path))
        feats = self.audio_feature_fn(waveform, sr, self.num_frames)
        np.save(cache, feats)
        return feats

    def _keypoints_path(self, video: Path, frame_idx: int) -> Path:
        return self.cache_dir / "keypoints" / (
            f"{video.stem}_{frame_idx:06d}.npy")

    def _load_keypoints(self, video: Path, frames: np.ndarray,
                        start: int) -> np.ndarray:
        """[T, K, 3] from cache or processor (":559-667")."""
        kps = np.zeros((self.num_frames, self.num_keypoints, 3), np.float32)
        for t in range(self.num_frames):
            p = self._keypoints_path(video, start + t)
            if p.exists():
                kps[t] = np.load(p)
            elif self.keypoint_processor is not None:
                img = ((frames[:, t].transpose(1, 2, 0) + 1) * 127.5
                       ).astype(np.uint8)
                k = self.keypoint_processor.extract_keypoints(img)
                if k is None:
                    if self.tracker:
                        self.tracker.track(
                            str(video),
                            VideoEvent.LANDMARK_DETECTION_FAILED,
                            {"frame": start + t})
                    continue
                kps[t] = k
                p.parent.mkdir(parents=True, exist_ok=True)
                np.save(p, k)
        return kps

    # -- sampling -------------------------------------------------------

    def __len__(self) -> int:
        return len(self.filtered_data)

    def _empty_sample(self) -> Dict[str, Any]:
        """zero-filled fallback (":1056-1069")."""
        c = 3
        return {
            "frames": np.zeros((c, self.num_frames, *self.frame_size),
                               np.float32),
            "conditions": {
                "text": "",
                "reference": np.zeros((c, 1, *self.frame_size), np.float32),
            },
            "metadata": {"empty": True},
        }

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        if not 0 <= idx < len(self.filtered_data):
            raise IndexError(idx)
        try:
            item = self.filtered_data[idx]
            video = self.data_dir / item["relative_path"]

            start = 0
            total = item.get("total_frames", 0)
            if total > self.num_frames:
                start = int(self.rng.integers(0, total - self.num_frames))

            frames = self._load_frames(video, start)
            conditions: Dict[str, Any] = {
                "text": item.get("text", ""),
                # first frame as reference (":957")
                "reference": frames[:, :1],
            }
            if (item.get("has_audio") and
                    self.condition_ratios.get("audio", 0) > 0):
                try:
                    conditions["audio"] = self._load_audio_features(video)
                except Exception as e:
                    logger.error(f"audio load failed for {video}: {e}")
                    conditions["audio"] = np.zeros(
                        (self.num_frames, self.audio_dim), np.float32)
            if (item.get("has_pose") and
                    self.condition_ratios.get("pose", 0) > 0):
                kps = self._load_keypoints(video, frames, start)
                hm = np.stack([
                    generate_heatmaps(kps[t], self.heatmap_size)
                    for t in range(self.num_frames)])   # [T, K, H, W]
                conditions["pose"] = hm.transpose(1, 0, 2, 3)  # [K,T,H,W]
            return {"frames": frames, "conditions": conditions,
                    "metadata": {"video": str(video), "start": start}}
        except Exception as e:
            if self.tracker:
                self.tracker.track(
                    str(self.filtered_data[idx].get("relative_path", idx)),
                    VideoEvent.PROCESSING_ERROR, {"error": str(e)})
            logger.error(f"sample {idx} failed: {e}")
            return self._empty_sample()

    def batches(self, batch_size: int, shuffle: bool = True):
        """Host-side batch iterator (stacks numpy, drops remainder)."""
        idx = np.arange(len(self))
        while True:
            if shuffle:
                self.rng.shuffle(idx)
            for i in range(0, len(idx) - batch_size + 1, batch_size):
                samples = [self[j] for j in idx[i:i + batch_size]]
                yield {
                    "frames": np.stack([s["frames"] for s in samples]),
                    "conditions": samples[0]["conditions"].keys(),
                    "samples": samples,
                }


class Wav2VecFeatureExtractor:
    """wav2vec 2.0 audio features (the spec's intended extractor,
    reference README.md:124-128 — never wired in the reference, which
    shipped torch.randn placeholders instead).

    Uses transformers' Wav2Vec2Model when the weights are available
    locally; otherwise raises at construction so callers can fall back to
    AudioFeatureExtractor (log-mel) explicitly.
    """

    def __init__(self, model_name: str = "facebook/wav2vec2-base-960h",
                 dim: int = 1024, fps: float = 16.0, device: str = "cpu"):
        import torch
        from transformers import Wav2Vec2Model
        self.torch = torch
        self.model = Wav2Vec2Model.from_pretrained(model_name).eval()
        self.dim = dim
        self.fps = fps

    def __call__(self, waveform: np.ndarray, sr: int,
                 num_frames: int) -> np.ndarray:
        torch = self.torch
        if sr != 16000:   # wav2vec expects 16 kHz
            idx = np.linspace(0, len(waveform) - 1,
                              int(len(waveform) * 16000 / sr))
            waveform = np.interp(idx, np.arange(len(waveform)), waveform)
        with torch.no_grad():
            out = self.model(torch.from_numpy(
                waveform.astype(np.float32))[None]).last_hidden_state[0]
        feats = out.numpy()                       # [T50hz, 768]
        # resample 50 Hz wav2vec frames onto video frames; tile to dim
        idx = np.linspace(0, len(feats) - 1, num_frames).astype(int)
        sel = feats[idx]
        reps = int(np.ceil(self.dim / sel.shape[1]))
        return np.tile(sel, (1, reps))[:, :self.dim].astype(np.float32)


def _sanity_main():
    """Dataset self-test (reference omnihuman_dataset.py main(),
    ":1095-1201"): directory checks, annotation auto-creation, first-item
    load, 2-item batch, PASS/FAIL log."""
    import argparse
    parser = argparse.ArgumentParser("omnihuman dataset sanity test")
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--num_frames", type=int, default=8)
    args = parser.parse_args()

    ok = True
    if not os.path.isdir(args.data_dir):
        logger.error(f"data_dir missing: {args.data_dir}")
        raise SystemExit(1)
    ds = OmniHumanDataset(args.data_dir, num_frames=args.num_frames,
                          condition_ratios={"text": 1.0, "reference": 1.0,
                                            "audio": 0.5, "pose": 0.0})
    logger.info(f"dataset size: {len(ds)}")
    if len(ds) == 0:
        logger.error("FAIL: no usable videos")
        raise SystemExit(1)
    s = ds[0]
    logger.info(f"first item: frames {s['frames'].shape}, "
                f"conditions {sorted(s['conditions'])}")
    ok &= s["frames"].shape[0] == 3
    if len(ds) >= 2:
        batch = next(ds.batches(2, shuffle=False))
        logger.info(f"2-item batch: {batch['frames'].shape}")
        ok &= batch["frames"].shape[0] == 2
    logger.info("dataset sanity test PASSED" if ok else "FAILED")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    _sanity_main()
