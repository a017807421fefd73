"""Inference input sources: images, videos, webcams, RTSP streams.

Capability parity with the reference loaders (utils/datasets.py:299-515
LoadImages / LoadWebcam / LoadStreams): a unified iterator API yielding
(path_or_name, frame_rgb, capture_or_None). Streams are read on daemon
threads keeping only the freshest frame, like LoadStreams.
"""

from __future__ import annotations

import threading
import time
from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import numpy as np

VID_EXTS = {".mov", ".avi", ".mp4", ".mpg", ".mpeg", ".m4v", ".wmv", ".mkv"}
IMG_EXTS = {".bmp", ".jpg", ".jpeg", ".png", ".tif", ".tiff", ".webp"}


class MediaSource:
    """Iterate a path (image/video/dir/glob), webcam index, or stream URL."""

    def __init__(self, source: str):
        self.source = str(source)
        self.is_webcam = self.source.isnumeric()
        self.is_stream = self.source.lower().startswith(
            ("rtsp://", "rtmp://", "http://", "https://"))

    def __iter__(self) -> Iterator[Tuple[str, np.ndarray, Optional[object]]]:
        import cv2

        if self.is_webcam or self.is_stream:
            cap = cv2.VideoCapture(int(self.source) if self.is_webcam
                                   else self.source)
            assert cap.isOpened(), f"failed to open {self.source}"
            n = 0
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                n += 1
                yield f"{self.source}_{n}", frame[:, :, ::-1], cap
            cap.release()
            return

        p = Path(self.source)
        files: List[Path]
        if p.is_dir():
            files = sorted(f for f in p.rglob("*")
                           if f.suffix.lower() in IMG_EXTS | VID_EXTS)
        else:
            files = [p]
        for f in files:
            if f.suffix.lower() in VID_EXTS:
                cap = cv2.VideoCapture(str(f))
                while True:
                    ok, frame = cap.read()
                    if not ok:
                        break
                    yield str(f), frame[:, :, ::-1], cap
                cap.release()
            else:
                img = cv2.imread(str(f))
                assert img is not None, f"failed to read {f}"
                yield str(f), img[:, :, ::-1], None


class ThreadedStreams:
    """Multi-stream reader: one daemon thread per source keeps the latest
    frame (reference LoadStreams, datasets.py:437-515)."""

    def __init__(self, sources: List[str], fps_sleep: float = 0.01):
        import cv2

        self.caps = []
        self.frames: List[Optional[np.ndarray]] = []
        self.threads = []
        self.running = True
        self.fps_sleep = fps_sleep
        for s in sources:
            cap = cv2.VideoCapture(int(s) if s.isnumeric() else s)
            assert cap.isOpened(), f"failed to open stream {s}"
            ok, frame = cap.read()
            assert ok, f"failed to read from {s}"
            self.caps.append(cap)
            self.frames.append(frame[:, :, ::-1])
            t = threading.Thread(target=self._reader,
                                 args=(len(self.caps) - 1,), daemon=True)
            t.start()
            self.threads.append(t)

    def _reader(self, i: int):
        while self.running:
            ok, frame = self.caps[i].read()
            if ok:
                self.frames[i] = frame[:, :, ::-1]
            else:
                time.sleep(0.1)
            time.sleep(self.fps_sleep)

    def latest(self) -> List[np.ndarray]:
        return [f.copy() for f in self.frames]

    def close(self):
        self.running = False
        for c in self.caps:
            c.release()
