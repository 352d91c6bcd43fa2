"""Temporal subsampling utility (productized test_scripts/video_subsampler/
vid_sub_sampler.py:5-45: keep every Nth frame, retime to <= target seconds).
"""

from __future__ import annotations

from ..properties import Encoding
from .video import VideoReader, VideoWriter


def subsample_video(input_path: str, output_path: str, keep_every: int = 10,
                    target_seconds: float = 20.0,
                    encoding: Encoding = Encoding.MJPG) -> int:
    """Keep every ``keep_every``-th frame and retime so the result lasts at
    most ``target_seconds``.  Returns frames written."""
    if keep_every < 1:
        raise ValueError("keep_every must be >= 1")
    with VideoReader(input_path) as r:
        kept = [f for i, f in enumerate(r) if i % keep_every == 0]
    if not kept:
        return 0
    fps = max(len(kept) / target_seconds, 1.0)
    h, w = kept[0].shape[:2]
    with VideoWriter(output_path, fps, w, h, encoding) as wr:
        for f in kept:
            wr.write(f)
        return wr.frames_written
