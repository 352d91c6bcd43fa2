"""Application API: the reference's L4 entry functions, rebuilt.

Maps one-to-one onto the reference surface (SURVEY.md §1 L4):

* ``DiPsJob``           <- ``DiPsProperties`` builder incl. paths + callback
                            (dips/src/lib.rs:63-170)
* ``perform_dips``      <- dips/src/lib.rs:252-257
* ``run_dips_on_file``  <- dips_alt/src/lib.rs:554-690
* ``custom_dips_on_files`` <- dips_alt/src/lib.rs:693-900 (raw .dat batch)
* ``extract_thumbnail`` <- dips/src/lib.rs:263-266 (re-exported from io)

The streaming loop runs host decode on a worker thread feeding a bounded
queue (the TPU analogue of GStreamer's streaming thread + appsink callback,
dips/src/frame_extractor.rs:206-276) so decode overlaps device compute
instead of the reference's fully serialized decode->upload->dispatch->
blocking-readback per frame.
"""

from __future__ import annotations

import dataclasses
import logging
import queue
import threading
from typing import Callable, Iterable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .errors import DecodeError, FrameCallbackError, OutputPathError, VideoPathError
from .models import DiPsEngine
from .ops.oracle import NUM_STATS
from .properties import DiPsProperties, Encoding
from .io.video import VideoReader, VideoWriter
from .io.thumbnail import extract_thumbnail  # noqa: F401  (re-export, L4 parity)
from .io.datfiles import read_dat_dir

log = logging.getLogger("dips_tpu")

#: Observation hook called once per processed frame with
#: (frame_index, input_rgb, output_map, stats_row).  The reference's
#: callback (fn(u32,u32,&[u8],&mut ComputeState) -> Vec<u8>,
#: dips/src/lib.rs:23) *computes* the frame; here compute is batched on
#: device, so the hook observes/overrides the already-computed map: return
#: None to keep it, or a replacement uint8 array to override.
FrameCallback = Callable[[int, np.ndarray, np.ndarray, np.ndarray],
                         Optional[np.ndarray]]


@dataclasses.dataclass
class DiPsJob:
    """Builder-style job config: pipeline properties + endpoints.

    Field parity with the reference builder (video_path, frame_callback,
    output_path, colorize, spatial window, sensitivity, filter, chroma —
    dips/src/lib.rs:75-169) with the pipeline knobs living in ``properties``.
    """

    properties: DiPsProperties = dataclasses.field(
        default_factory=DiPsProperties)
    video_path: Optional[str] = None
    output_path: Optional[str] = None
    encoding: Encoding = Encoding.MJPG
    frame_callback: Optional[FrameCallback] = None
    batch: int = 8
    backend: str = "xla"
    queue_depth: int = 4  # decode-ahead batches

    # builder parity ------------------------------------------------------
    def with_video_path(self, p: str) -> "DiPsJob":
        return dataclasses.replace(self, video_path=p)

    def with_output_path(self, p: str) -> "DiPsJob":
        return dataclasses.replace(self, output_path=p)

    def with_encoding(self, e: Encoding | str) -> "DiPsJob":
        e = Encoding[e.upper()] if isinstance(e, str) else e
        return dataclasses.replace(self, encoding=e)

    def with_frame_callback(self, cb: FrameCallback) -> "DiPsJob":
        return dataclasses.replace(self, frame_callback=cb)

    def with_properties(self, props: DiPsProperties) -> "DiPsJob":
        return dataclasses.replace(self, properties=props)


def _decode_worker(reader: VideoReader, batch: int,
                   q: "queue.Queue", stop: threading.Event) -> None:
    """Decode thread: push lists of <=batch frames; None = EOS, exception
    objects propagate decode failures."""
    try:
        buf: List[np.ndarray] = []
        for frame in reader:
            if stop.is_set():
                return
            buf.append(frame)
            if len(buf) == batch:
                q.put(buf)
                buf = []
        if buf:
            q.put(buf)
        q.put(None)
    except Exception as e:  # pragma: no cover - decoder internals
        q.put(e)


def stream_dips(job: DiPsJob) -> Iterator[Tuple[int, np.ndarray, np.ndarray,
                                                np.ndarray]]:
    """Core streaming loop: yields (frame_index, input, output, stats) while
    a decode thread keeps the device fed (bounded queue = backpressure)."""
    if not job.video_path:
        raise VideoPathError("no video path set (DiPsJob.with_video_path)")
    reader = VideoReader(job.video_path)
    engine = DiPsEngine(job.properties, reader.height, reader.width,
                        batch=job.batch, backend=job.backend)
    q: "queue.Queue" = queue.Queue(maxsize=job.queue_depth)
    stop = threading.Event()
    worker = threading.Thread(
        target=_decode_worker, args=(reader, job.batch, q, stop), daemon=True)
    worker.start()
    idx = 0
    try:
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, Exception):
                raise DecodeError(str(item)) from item
            outs, stats = engine.process_batch(item)
            for i in range(len(item)):
                out = outs[i]
                if job.frame_callback is not None:
                    try:
                        replacement = job.frame_callback(
                            idx, item[i], out, stats[i])
                    except Exception as e:
                        raise FrameCallbackError(str(e)) from e
                    if replacement is not None:
                        out = replacement
                yield idx, item[i], out, stats[i]
                idx += 1
    finally:
        stop.set()
        reader.close()


def perform_dips(job: DiPsJob) -> np.ndarray:
    """Run the whole job: input video -> diff-map video; returns per-frame
    stats (N, NUM_STATS).  (ref: perform_dips, dips/src/lib.rs:252-257.)"""
    if not job.output_path:
        raise OutputPathError("no output path set (DiPsJob.with_output_path)")
    reader_probe = VideoReader(job.video_path) if job.video_path else None
    if reader_probe is None:
        raise VideoPathError("no video path set")
    fps, w, h = reader_probe.fps, reader_probe.width, reader_probe.height
    reader_probe.close()

    writer = VideoWriter(job.output_path, fps, w, h, job.encoding)
    stats_rows: List[np.ndarray] = []
    with writer:
        for idx, _inp, out, stats in stream_dips(job):
            writer.write(out)
            stats_rows.append(stats)
            if idx % 100 == 0:
                log.info("frame %d", idx)
    return (np.stack(stats_rows) if stats_rows
            else np.zeros((0, NUM_STATS), np.float32))


def run_dips_on_file(input_path: str, output_path: str,
                     encoding: Encoding | str = Encoding.MJPG,
                     properties: Optional[DiPsProperties] = None,
                     refresh_markers: Sequence[int] = (),
                     batch: int = 8, backend: str = "xla") -> np.ndarray:
    """dips_alt CLI-style entry (ref dips_alt/src/lib.rs:554-690): bare
    refresh markers re-capture the baseline mid-stream."""
    props = properties or DiPsProperties()
    if refresh_markers:
        props = props.with_refresh_markers(
            tuple(props.refresh_markers) + tuple(refresh_markers))
    job = DiPsJob(properties=props, video_path=input_path,
                  output_path=output_path, batch=batch, backend=backend)
    job = job.with_encoding(encoding)
    return perform_dips(job)


def custom_dips_on_files(data_dir: str, output_path: str,
                         width: int = 273, height: int = 640,
                         fps: float = 5.0,
                         properties: Optional[DiPsProperties] = None,
                         encoding: Encoding = Encoding.MJPG,
                         batch: int = 8, backend: str = "xla") -> np.ndarray:
    """Raw 'Dat_N.d' instrument-dump batch mode (ref dips_alt/src/lib.rs:
    693-900; geometry defaults mirror its hardcoded 273x640, fps=5)."""
    props = properties or DiPsProperties()
    frames = list(read_dat_dir(data_dir, width, height))
    if not frames:
        raise VideoPathError(f"no Dat_*.d files in {data_dir}")
    engine = DiPsEngine(props, height, width, batch=batch, backend=backend)
    stats_rows = []
    with VideoWriter(output_path, fps, width, height, encoding) as writer:
        for i in range(0, len(frames), batch):
            outs, stats = engine.process_batch(frames[i:i + batch])
            for o in outs:
                writer.write(o)
            stats_rows.append(stats)
    return np.concatenate(stats_rows)
