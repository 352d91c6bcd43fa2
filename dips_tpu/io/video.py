"""Host-side video ingest/egress on OpenCV videoio.

The media layer of the rebuild (reference L3, SURVEY.md §1): the GStreamer
graph (dips/src/frame_extractor.rs:38-290) and the OpenCV loop
(dips_alt/src/lib.rs:571-690) collapse into two small classes.  Decode stays
on the host — the TPU only ever sees planar uint8 batches.

All frames cross this boundary as RGB uint8 (H, W, 3); BGR<->RGB conversion
happens here (ref cvt_color calls, dips_alt/src/lib.rs:623-629,654-660).
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import cv2
import numpy as np

from ..errors import DecodeError, EncodeError, VideoPathError
from ..properties import Encoding


class VideoReader:
    """Iterates RGB uint8 frames from a video file or camera.

    Mirrors ``VideoCapture::from_file`` + read loop
    (dips_alt/src/lib.rs:571-597); PTS handling is implicit (constant-fps
    containers via cv2).
    """

    def __init__(self, path: str):
        if not os.path.exists(path):
            raise VideoPathError(f"input video not found: {path}")
        self._cap = cv2.VideoCapture(path)
        if not self._cap.isOpened():
            raise DecodeError(f"could not open video: {path}")
        self.path = path
        self.fps = float(self._cap.get(cv2.CAP_PROP_FPS)) or 30.0
        self.width = int(self._cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.height = int(self._cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self.frame_count = int(self._cap.get(cv2.CAP_PROP_FRAME_COUNT))

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            ok, frame = self._cap.read()
            if not ok:
                return
            yield cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)

    def read(self) -> Optional[np.ndarray]:
        ok, frame = self._cap.read()
        if not ok:
            return None
        return cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)

    def iter_bgr(self) -> Iterator[np.ndarray]:
        """Raw decoder-layout (BGR) frames — the zero-conversion path for
        the native planarizer, which fuses the BGR->RGB swap."""
        while True:
            ok, frame = self._cap.read()
            if not ok:
                return
            yield frame

    def close(self) -> None:
        self._cap.release()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def open_camera(index: int = 0) -> "VideoReader":
    """Webcam capture (ref VideoCapture::new(0, CAP_ANY),
    dips_alt/src/lib.rs:140)."""
    r = VideoReader.__new__(VideoReader)
    r._cap = cv2.VideoCapture(index)
    if not r._cap.isOpened():
        raise DecodeError(f"could not open camera {index}")
    r.path = f"camera:{index}"
    r.fps = float(r._cap.get(cv2.CAP_PROP_FPS)) or 30.0
    r.width = int(r._cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    r.height = int(r._cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    r.frame_count = -1
    return r


# Encoders this image's OpenCV cannot produce, with a safe substitute.
_FOURCC_FALLBACK = {"H264": "MJPG", "RGBA": "HFYU"}


class VideoWriter:
    """RGB uint8 frames -> video file, with the reference's encodings
    (RGBA/HFYU/H264, dips_alt/src/lib.rs:38-55) plus MJPG/mp4v.

    Falls back (with a note on the instance) when a codec is unavailable
    instead of failing the run.
    """

    def __init__(self, path: str, fps: float, width: int, height: int,
                 encoding: Encoding = Encoding.MJPG):
        self.path = path
        self.fallback_used: Optional[str] = None
        d = os.path.dirname(os.path.abspath(path))
        if not os.path.isdir(d):
            raise EncodeError(f"output directory missing: {d}")
        fourcc = encoding.fourcc
        self._w = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*fourcc), fps, (width, height))
        if not self._w.isOpened() and fourcc in _FOURCC_FALLBACK:
            alt = _FOURCC_FALLBACK[fourcc]
            self._w = cv2.VideoWriter(
                path, cv2.VideoWriter_fourcc(*alt), fps, (width, height))
            self.fallback_used = alt
            if self._w.isOpened():
                import logging
                import warnings
                msg = (f"encoder {encoding.name} unavailable in this OpenCV "
                       f"build; falling back to {alt} for {path}")
                logging.getLogger("dips_tpu").warning(msg)
                warnings.warn(msg, RuntimeWarning, stacklevel=2)
        if not self._w.isOpened():
            raise EncodeError(
                f"could not open encoder {encoding.name} for {path}")
        self.frames_written = 0

    def write(self, frame_rgb: np.ndarray) -> None:
        if frame_rgb.ndim == 2 or frame_rgb.shape[-1] == 1:
            frame_rgb = cv2.cvtColor(
                frame_rgb.reshape(frame_rgb.shape[0], frame_rgb.shape[1]),
                cv2.COLOR_GRAY2RGB)
        self._w.write(cv2.cvtColor(frame_rgb, cv2.COLOR_RGB2BGR))
        self.frames_written += 1

    def close(self) -> None:
        self._w.release()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
