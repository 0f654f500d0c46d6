"""Problematic-video event tracker (data-plane failure detection).

Capability parity with reference Omnihuman/video_tracker.py:8-361
(`ProblematicVideoTracker`): typed events (VIDEO_TOO_SHORT, NO_AUDIO,
INVALID_FRAMES, FACE/LANDMARK_DETECTION_FAILED, PROCESSING_ERROR,
NO_VALID_WINDOWS), handler registry + dispatch, append-only event log,
persisted invalid-video list, processing summary, plus the offline
utilities to parse logs and clean up bad videos (":187-313").

Design change: the singleton pattern is kept for API parity but a
`reset()` hook exists so tests and multi-run processes aren't wedged by
the reference's one-shot `_initialized` latch.
"""

from __future__ import annotations

import enum
import os
import shutil
import time
from dataclasses import dataclass, field
from datetime import datetime
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Set

from omnihuman_tpu.utils.logging import logger


class VideoEvent(enum.Enum):
    VIDEO_TOO_SHORT = "video_too_short"
    NO_AUDIO = "no_audio"
    INVALID_FRAMES = "invalid_frames"
    FACE_DETECTION_FAILED = "face_detection_failed"
    LANDMARK_DETECTION_FAILED = "landmark_detection_failed"
    PROCESSING_ERROR = "processing_error"
    NO_VALID_WINDOWS = "no_valid_windows"


@dataclass
class VideoEventData:
    video_path: str
    event_type: VideoEvent
    details: Dict[str, Any] = field(default_factory=dict)
    timestamp: Optional[float] = None

    def __post_init__(self):
        if self.timestamp is None:
            self.timestamp = time.time()


class ProblematicVideoTracker:
    """Singleton event bus for data-pipeline failures."""

    _instance: Optional["ProblematicVideoTracker"] = None

    def __new__(cls, output_dir=None):
        if cls._instance is None:
            if output_dir is None:
                raise ValueError("output_dir required for first init")
            inst = super().__new__(cls)
            inst._init(Path(output_dir))
            cls._instance = inst
        return cls._instance

    def _init(self, output_dir: Path):
        self.output_dir = output_dir
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.invalid_videos_path = self.output_dir / "invalid_videos.txt"
        self.event_log_path = self.output_dir / "video_events.log"
        self.summary_path = self.output_dir / "processing_summary.txt"
        self.problematic_videos: Set[str] = set()
        self.failed_videos: Dict[str, List[VideoEventData]] = {}
        self.event_counts: Dict[VideoEvent, int] = {e: 0 for e in VideoEvent}
        self._handlers: Dict[VideoEvent, List[Callable]] = {
            e: [] for e in VideoEvent}
        self.register_default_handlers()
        logger.info(f"ProblematicVideoTracker at {output_dir}")

    @classmethod
    def get_instance(cls) -> "ProblematicVideoTracker":
        if cls._instance is None:
            raise RuntimeError("ProblematicVideoTracker not initialized")
        return cls._instance

    @classmethod
    def reset(cls):
        cls._instance = None

    # -- handlers -----------------------------------------------------------

    def register_default_handlers(self):
        for e in VideoEvent:
            self.register_handler(e, self._log_event)
            self.register_handler(e, self._track_failure)
            self.register_handler(e, self._update_counts)

    def register_handler(self, event: VideoEvent, handler: Callable):
        self._handlers.setdefault(event, []).append(handler)

    def dispatch(self, event_data: VideoEventData):
        for handler in self._handlers.get(event_data.event_type, []):
            try:
                handler(event_data)
            except Exception as e:  # pragma: no cover
                logger.error(f"Error in event handler: {e}")

    def track(self, video_path: str, event: VideoEvent,
              details: Optional[Dict] = None):
        """Convenience: build + dispatch."""
        self.dispatch(VideoEventData(str(video_path), event, details or {}))

    # -- default handlers ---------------------------------------------------

    def _log_event(self, d: VideoEventData):
        ts = datetime.fromtimestamp(d.timestamp).strftime("%Y-%m-%d %H:%M:%S")
        with open(self.event_log_path, "a") as f:
            f.write(f"{ts}\t{d.event_type.value}\t{d.video_path}\t"
                    f"{d.details}\n")

    def _track_failure(self, d: VideoEventData):
        self.failed_videos.setdefault(d.video_path, []).append(d)
        self.problematic_videos.add(d.video_path)
        self._save_failures()

    def _update_counts(self, d: VideoEventData):
        self.event_counts[d.event_type] += 1

    def _save_failures(self):
        with open(self.invalid_videos_path, "w") as f:
            f.write("# Failed Videos Report\n\n")
            for path, events in self.failed_videos.items():
                f.write(f"\n{path}:\n")
                for ev in sorted(events, key=lambda e: e.timestamp):
                    ts = datetime.fromtimestamp(ev.timestamp).strftime(
                        "%Y-%m-%d %H:%M:%S")
                    f.write(f"  {ts} - {ev.event_type.value}: "
                            f"{ev.details}\n")

    def save_summary(self):
        with open(self.summary_path, "w") as f:
            f.write("# Video Processing Summary\n\n")
            f.write("Total problematic videos: "
                    f"{len(self.problematic_videos)}\n\n")
            f.write("Event Counts:\n")
            for e, c in self.event_counts.items():
                if c > 0:
                    f.write(f"  {e.value}: {c}\n")

    def get_problematic_videos(self) -> Set[str]:
        return self.problematic_videos


# ---------------------------------------------------------------------------
# offline utilities (reference video_tracker.py:187-313)


def parse_event_log(log_path: str) -> Dict[str, List[str]]:
    """event log → {video_path: [event names]}."""
    failures: Dict[str, List[str]] = {}
    if not os.path.exists(log_path):
        return failures
    with open(log_path) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) >= 3:
                _, event, path = parts[0], parts[1], parts[2]
                failures.setdefault(path, []).append(event)
    return failures


def cleanup_failed_videos(log_path: str, action: str = "list",
                          quarantine_dir: Optional[str] = None
                          ) -> List[str]:
    """Offline cleanup: list / move / delete videos named in the log
    (reference's log-parsing + failed-video cleanup CLIs)."""
    failures = parse_event_log(log_path)
    handled = []
    for path in failures:
        if not os.path.exists(path):
            continue
        if action == "delete":
            os.remove(path)
        elif action == "move":
            assert quarantine_dir, "quarantine_dir required for move"
            os.makedirs(quarantine_dir, exist_ok=True)
            shutil.move(path, os.path.join(quarantine_dir,
                                           os.path.basename(path)))
        handled.append(path)
    return handled
