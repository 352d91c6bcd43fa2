"""Optional GStreamer ingest backend (parity with the reference's primary
media layer, dips/src/frame_extractor.rs:38-290).

The reference builds a ``filesrc -> decodebin -> queue -> videoconvert ->
videoscale -> appsink(RGBA, sync=false)`` graph; this backend mirrors that
via PyGObject when present.  GStreamer is typically absent on TPU hosts
(including this image), so everything is gated: :func:`available` reports
the backend state, and :class:`GstVideoReader` raises ``DecodeError`` with
a clear message when the stack is missing.  The OpenCV backend
(io/video.py) is the default either way.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from ..errors import DecodeError, VideoPathError

_gst = None
_gst_err: Optional[str] = None


def _load():
    global _gst, _gst_err
    if _gst is not None or _gst_err is not None:
        return _gst
    try:
        import gi
        gi.require_version("Gst", "1.0")
        gi.require_version("GstApp", "1.0")
        from gi.repository import Gst, GstApp  # noqa: F401
        Gst.init(None)
        _gst = Gst
    except Exception as e:  # ImportError, ValueError from require_version
        _gst_err = f"GStreamer unavailable: {e}"
    return _gst


def available() -> bool:
    """True when PyGObject + GStreamer 1.0 are importable."""
    return _load() is not None


class GstVideoReader:
    """RGB uint8 frame iterator over a GStreamer decode graph.

    Interface-compatible with io.video.VideoReader (fps/width/height/read/
    iteration/close) so the application layer can swap backends.
    """

    def __init__(self, path: str):
        import os
        if not os.path.exists(path):
            raise VideoPathError(f"input video not found: {path}")
        gst = _load()
        if gst is None:
            raise DecodeError(_gst_err or "GStreamer unavailable")
        # appsink caps mirror the reference: RGB, unthrottled (sync=false,
        # ref frame_extractor.rs:147)
        self._pipeline = gst.parse_launch(
            f'filesrc location="{path}" ! decodebin ! queue ! videoconvert '
            f'! video/x-raw,format=RGB ! appsink name=sink sync=false '
            f'max-buffers=8 drop=false')
        self._sink = self._pipeline.get_by_name("sink")
        self._sink.set_property("emit-signals", False)
        self._gst = gst
        self._pipeline.set_state(gst.State.PLAYING)
        self.path = path
        self.fps = 30.0
        self.width = 0
        self.height = 0
        self.frame_count = -1

    def read(self) -> Optional[np.ndarray]:
        gst = self._gst
        sample = self._sink.emit("pull-sample")
        if sample is None:
            return None
        caps = sample.get_caps().get_structure(0)
        self.width = caps.get_value("width")
        self.height = caps.get_value("height")
        num, den = caps.get_fraction("framerate")[1:3] if hasattr(
            caps, "get_fraction") else (30, 1)
        if den:
            self.fps = num / den
        buf = sample.get_buffer()
        ok, info = buf.map(gst.MapFlags.READ)
        if not ok:
            raise DecodeError("buffer map failed")
        try:
            frame = np.frombuffer(info.data, np.uint8).reshape(
                self.height, self.width, 3).copy()
        finally:
            buf.unmap(info)
        return frame

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            f = self.read()
            if f is None:
                return
            yield f

    def iter_bgr(self) -> Iterator[np.ndarray]:
        for f in self:
            yield f[..., ::-1]

    def close(self) -> None:
        self._pipeline.set_state(self._gst.State.NULL)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def open_video(path: str, backend: str = "auto"):
    """Backend-selecting reader factory: 'opencv', 'gstreamer', or 'auto'
    (OpenCV first — it is always present in this distribution)."""
    from .video import VideoReader
    if backend == "gstreamer":
        return GstVideoReader(path)
    if backend == "opencv":
        return VideoReader(path)
    if backend == "auto":
        return VideoReader(path)
    raise ValueError(f"unknown video backend {backend!r}")
