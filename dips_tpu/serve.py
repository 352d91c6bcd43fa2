"""Frame-serving daemon: a TCP service around :class:`DiPsEngine`.

The reference is a desktop tool; the rebuild is meant for production
deployment, so the engine gets a serving surface: a long-lived process that
owns the device pipeline and accepts raw frames over a socket.

Protocol (little-endian, length-prefixed JSON header + raw payload):

  request:  u32 header_len | header JSON | payload bytes
  response: u32 header_len | header JSON | payload bytes

Header commands:
  {"cmd": "hello"}                      -> {"ok", "config", "frame_index"}
  {"cmd": "process", "shape": [H,W,3]}  + uint8 RGB payload
        -> {"ok", "stats": [...], "shape": [H,W,C]} + uint8 map payload
  {"cmd": "process_batch", "shape": [N,H,W,3]} + uint8 RGB payload
        -> {"ok", "stats": [[...]xN], "shape": [N,H,W,C]} + uint8 payload
        (one request per device batch: amortises the per-request round
        trip the way the engine amortises per-frame dispatch)
  {"cmd": "snapshot"}                   -> {"ok"}   (re-pin the baseline)
        (--events daemons add "events"/"event_open" to process replies;
        --auto-refresh daemons add "baseline_refresh": the frame index
        where this reply's stats re-pinned the session's baseline)
  {"cmd": "heatmap"}                    -> {"ok", "shape"} + f32 payload
  {"cmd": "flicker"}                    -> {"ok", "shape", "freq_hz",
        "frames"} + f32 amplitude payload (requires binding with
        "flicker_hz" + "flicker_fps": the server then streams a
        per-session FlickerAnalyzer over the frames it already has —
        per-camera vibration/mains-flicker maps without shipping pixels
        twice; reset/load restart the window)
  {"cmd": "save", "path": P}            -> {"ok"}   (checkpoint to disk)
  {"cmd": "load", "path": P}            -> {"ok", "frame_index"}
  {"cmd": "reset"} / {"cmd": "close"}
  {"cmd": "metrics"}                    -> {"ok", "uptime_s", "connections",
        "requests", "frames", "request_errors", "rejected",
        "active_sessions", "parked_sessions", "max_sessions", "coalesced",
        "latency_ms" (process-request service time: {count, p50, p90,
        p99, max} over the last 1024 requests), "coalesce_dispatches" /
        "coalesce_mean_fill" (coalesced servers: device dispatches and
        mean frames folded per dispatch), "flexible" (+ per-geometry
        "pooled_engines" on flexible daemons), "frame_index"}

Each connection gets its OWN engine (private baseline/ring/heatmap state),
so up to ``max_sessions`` clients — e.g. N cameras — stream concurrently
against one chip; JAX serialises their dispatches.  Omitting height/width
starts a geometry-FLEXIBLE daemon: each session's engine is sized from its
first frame (or loaded checkpoint) and idle engines pool per geometry —
one daemon serves a mixed-resolution camera fleet.  With ``--coalesce N``
a flexible daemon creates one stacked-stream coalescer PER GEOMETRY
(lazily, or up front via ``--warm``), so mixed fleets still share device
dispatches within each resolution.

A request may also carry ``"roi": [y0, x0, y1, x1]`` — a per-session
analysis region consumed at the first-request engine bind (each fleet
camera watches a different scene): that session's statistics, heatmap
and motion events reduce over the rectangle while its maps stay
full-frame.  Not available on coalescing daemons (the stacked kernel is
shared; use the daemon-wide ``--roi``), and a parked named session only
resumes under the same roi (``reset`` first to change it).

Reconnect/resume semantics: a client may tag its requests with a
``"session": <token>`` field (``DiPsClient(session=...)``); on reconnect
the same token resumes that session's streaming state (cursor, baseline,
ring).  Tokens are latest-wins: a new connection with a live token kicks
the previous holder and waits for its state to park (the dead-link
reconnect case).  :class:`ResilientDiPsClient` wraps this with automatic
backoff reconnection and exactly-once frame accounting for flaky edge
links.  Untagged clients get FRESH state on a multi-session server — a
pooled engine is reset before reuse, so one camera's baseline can never
leak into another's stream — except on a single-session server, where the
lone anonymous engine unambiguously resumes (back-compat).

Crash safety: ``--autosave DIR`` periodically checkpoints each NAMED
session's streaming state (every ``--autosave-every`` frames, atomically,
plus a flush on graceful close); after a daemon restart the first bind of
a token restores its last autosave, so a camera fleet survives a crash
with a bounded baseline-drift window instead of resuming fresh.  An
explicit ``reset`` discards the session's autosave too.

Motion events: ``--events`` runs a per-session
:class:`~dips_tpu.ops.events.MotionDetector` over the stats the daemon
already computes; process replies gain ``events`` (closed this request)
and ``event_open``, named sessions carry an open event across
park/resume, anonymous closes flush it into the goodbye, and the
``motion_events`` counter lands in metrics/Prometheus.  The default
``--event-on auto`` learns each camera's noise floor online.  Adding
``--event-webhook URL`` pushes every closed event to an HTTP endpoint
(async best-effort JSON POST, utils/webhook.py) so a fleet gets alerts
without polling; delivery outcomes land in the ``webhook_*`` counters.
Start with
``python -m dips_tpu.serve --port 7807 --height H --width W [options]``.
"""

from __future__ import annotations

import argparse
import glob
import json
import logging
import os
import socket
import struct
import sys
import tempfile
import threading
import time
from typing import Optional, Tuple

import numpy as np

from .errors import ReplyLost
from .models import DiPsEngine
from .properties import GEOMETRY_NAMES, DiPsProperties, parse_geometry

log = logging.getLogger("dips_tpu.serve")
_LEN = struct.Struct("<I")
#: protocol sanity caps: headers are small JSON; payloads are frames
#: (a 4K RGBA frame is ~33 MB) — reject anything absurd before allocating
_MAX_HEADER = 64 * 1024
_MAX_PAYLOAD = 256 * 1024 * 1024


def _send(sock: socket.socket, header: dict, payload: bytes = b"") -> None:
    hdr = json.dumps(header).encode()
    sock.sendall(_LEN.pack(len(hdr)) + hdr + payload)


#: a message that started arriving must finish within this long of zero
#: forward progress (then the connection is declared broken) — the short
#: idle poll timeout must never drop partially-read messages
_PARTIAL_TIMEOUT_S = 30.0


def _recv_exact(sock: socket.socket, n: int,
                started: bool = False) -> Optional[bytes]:
    """Read exactly ``n`` bytes.  ``socket.timeout`` propagates only while
    IDLE (nothing consumed and ``started`` false, i.e. between messages, so
    the server can poll its shutdown flag); mid-message stalls keep
    waiting — dropping a partial read would desync the framing — until
    ``_PARTIAL_TIMEOUT_S`` passes with no progress at all."""
    buf = bytearray()
    deadline = None
    while len(buf) < n:
        try:
            chunk = sock.recv(n - len(buf))
        except socket.timeout:
            if not started and not buf:
                raise
            now = time.monotonic()
            if deadline is None:
                deadline = now + _PARTIAL_TIMEOUT_S
            elif now > deadline:
                raise ValueError(
                    f"incomplete message: {len(buf)}/{n} bytes then "
                    f"{_PARTIAL_TIMEOUT_S:g}s of silence")
            continue
        if not chunk:
            return None
        buf.extend(chunk)
        deadline = None  # forward progress restarts the stall clock
    return bytes(buf)


def _recv(sock: socket.socket) -> Optional[Tuple[dict, bytes]]:
    raw_len = _recv_exact(sock, _LEN.size)
    if raw_len is None:
        return None
    hdr_len = _LEN.unpack(raw_len)[0]
    if hdr_len > _MAX_HEADER:
        raise ValueError(f"header length {hdr_len} exceeds {_MAX_HEADER}")
    hdr = _recv_exact(sock, hdr_len, started=True)
    if hdr is None:
        return None
    header = json.loads(hdr)
    n = int(header.get("payload_len", 0))
    if not 0 <= n <= _MAX_PAYLOAD:
        raise ValueError(f"payload length {n} exceeds {_MAX_PAYLOAD}")
    payload = _recv_exact(sock, n, started=True) if n else b""
    if n and payload is None:
        return None
    return header, payload


def _process_reply(eng, frames, header: dict) -> Tuple[dict, bytes]:
    """Run frames through the engine and build the (header, payload) reply.

    When the client asks for ``"packed": true`` and the engine emits
    THRESHOLD masks, the payload is bit-packed along the row axis (8x
    fewer bytes; ops/wire.py bit order) and the response header's
    ``shape`` stays the *unpacked* shape.  On a ``packed_wire`` engine
    the device-packed padded planes are forwarded VERBATIM (header gains
    ``"padded": [Hp, Wp]``) — no host unpack/repack on the serving path.
    """
    from .properties import OutputMode
    want = bool(header.get("packed")
                and eng.props.output == OutputMode.THRESHOLD)
    if want and eng.packed_wire:
        outs, stats = eng.process_frames(list(frames), packed=True)
        body = outs.tobytes()  # (N, 1, Hp//8, Wp) device-packed planes
        hdr = {"ok": True, "packed": True, "padded": [eng.hp, eng.wp],
               "shape": [len(frames), eng.height, eng.width, 1]}
    else:
        outs, stats = eng.process_frames(list(frames))
        if want:
            from .ops.wire import pack_mask_host
            body = pack_mask_host(outs[..., 0]).tobytes()
        else:
            body = outs.tobytes()
        hdr = {"ok": True, "packed": want, "shape": list(outs.shape)}
    hdr["payload_len"] = len(body)
    hdr["stats"] = [[float(v) for v in row] for row in stats]
    return hdr, body


class StreamCoalescer:
    """Shares ONE stacked-stream device step across serving sessions.

    Per-session ``DiPsEngine``\\ s dispatch one kernel per request; at many
    cameras the per-dispatch overhead dominates.  This dispatcher instead
    binds each session to a stream slot of a single
    :class:`~dips_tpu.parallel.MultiStreamEngine` and folds concurrently
    pending requests into ONE stacked kernel launch (the measured 2x
    aggregate-throughput path, BASELINE.md multi-stream table) — per-slot
    baseline/ring/cursor state stays private, idle slots ride along masked
    invalid.  Requests wait at most ``window_ms`` for co-tenants before the
    batch dispatches.
    """

    def __init__(self, props: DiPsProperties, height: int, width: int,
                 n_streams: int, batch: int = 1, backend: str = "auto",
                 window_ms: float = 2.0, n_devices: int = 1,
                 input_layout: str = "planar", downscale: int = 1):
        from .parallel import MultiStreamEngine, stream_mesh
        # slots shard over the first n_devices chips (ICI-order mesh);
        # the default 1-device mesh serves a whole camera fleet from one
        # chip, a pod slice scales the same daemon out
        mesh = stream_mesh(max(1, int(n_devices)))
        self.engine = MultiStreamEngine(props, height, width,
                                        n_streams=n_streams, batch=batch,
                                        mesh=mesh, backend=backend,
                                        input_layout=input_layout,
                                        downscale=downscale)
        self.n_streams = int(n_streams)
        self.window_s = window_ms / 1e3
        self._cv = threading.Condition()
        self._elock = threading.Lock()  # serialises engine state access
        self._free = list(range(n_streams - 1, -1, -1))
        self._bound: set = set()
        self._pending: dict = {}   # slot -> frames awaiting dispatch
        self._results: dict = {}   # slot -> (outs, stats) | Exception
        #: observability: device dispatches and total frames folded into
        #: them (mean fill = how well requests coalesce; guarded by _cv)
        self.dispatches = 0
        self.frames_folded = 0
        self._stopped = False
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def bind(self) -> int:
        with self._cv:
            if not self._free:
                raise RuntimeError("no free stream slots")
            slot = self._free.pop()
            self._bound.add(slot)
            return slot

    def rebind(self, slot: int) -> None:
        """Resume a parked (named-session) slot."""
        with self._cv:
            self._bound.add(slot)

    def release(self, slot: int, park: bool = False) -> None:
        """End a session.  ``park`` keeps the slot's state for a named-token
        resume (the slot stays allocated); otherwise the slot is reset and
        returned to the free list."""
        with self._cv:
            self._bound.discard(slot)
            if not park:
                with self._elock:
                    self.engine.reset_stream(slot)
                self._free.append(slot)

    def submit(self, slot: int, frames) -> Tuple[np.ndarray, np.ndarray]:
        """Block until ``frames`` (<= engine.batch) have been dispatched in
        a coalesced batch; returns this slot's (maps, stats)."""
        with self._cv:
            while slot in self._pending and not self._stopped:
                self._cv.wait(0.1)  # one outstanding request per slot
            if self._stopped:
                raise RuntimeError("coalescer shut down")
            self._pending[slot] = list(frames)
            self._cv.notify_all()
            while slot not in self._results and not self._stopped:
                self._cv.wait(0.1)
            res = self._results.pop(slot, None)
        if res is None:
            raise RuntimeError("coalescer shut down")
        if isinstance(res, Exception):
            raise res
        return res

    def _run(self) -> None:
        while True:
            with self._cv:
                while not self._pending and not self._stopped:
                    self._cv.wait(0.2)
                if self._stopped:
                    self._cv.notify_all()
                    return
                # brief window for the other live sessions' frames to land
                deadline = time.monotonic() + self.window_s
                while (len(self._pending) < len(self._bound)
                       and not self._stopped):
                    left = deadline - time.monotonic()
                    if left <= 0:
                        break
                    self._cv.wait(left)
                batch, self._pending = self._pending, {}
                self.dispatches += 1
                self.frames_folded += sum(len(f) for f in batch.values())
            results: dict = {}
            try:
                feeds = [batch.get(si, []) for si in range(self.n_streams)]
                with self._elock:
                    outs, stats, _ = self.engine.process_batch(feeds)
                    for si, frames in batch.items():
                        err = self.engine.failed.get(si)
                        if err is not None:
                            # per-request isolation: surface the error to
                            # this client, let the session keep streaming
                            self.engine.revive(si)
                            results[si] = RuntimeError(str(err))
                        else:
                            k = len(frames)
                            results[si] = (outs[si, :k], stats[si, :k])
            except Exception as e:  # whole-batch failure -> every waiter
                results = {si: RuntimeError(str(e)) for si in batch}
            with self._cv:
                self._results.update(results)
                self._cv.notify_all()

    def snapshot(self, slot: int) -> None:
        with self._elock:
            self.engine.snapshot(slot)

    def reset_slot(self, slot: int) -> None:
        with self._elock:
            self.engine.reset_stream(slot)

    def heatmap(self, slot: int) -> np.ndarray:
        with self._elock:
            return self.engine.heatmaps()[slot]

    def save_slot(self, slot: int, path: str) -> None:
        with self._elock:
            self.engine.save_stream(slot, path)

    def load_slot(self, slot: int, path: str) -> None:
        with self._elock:
            self.engine.load_stream(slot, path)

    def shutdown(self) -> None:
        with self._cv:
            self._stopped = True
            self._cv.notify_all()
        self._thread.join(timeout=5.0)


class _CoalescedSession:
    """Engine-shaped adapter binding one serving session to one coalescer
    stream slot (duck-types the ``DiPsEngine`` surface ``_serve_client``
    uses)."""

    packed_wire = False  # host-side packing still applies ("packed": true)

    def __init__(self, co: StreamCoalescer, slot: int):
        self._co = co
        self.slot = slot
        eng = co.engine
        self.props = eng.props
        self.height, self.width = eng.height, eng.width
        self.in_height, self.in_width = eng.in_height, eng.in_width
        self.batch, self.backend = eng.batch, eng.backend

    @property
    def frame_index(self) -> int:
        return self._co.engine.frame_cursors[self.slot]

    def process_frames(self, frames, packed: bool = False):
        if not len(frames):
            from .ops.oracle import NUM_STATS
            return (np.zeros((0, self.height, self.width,
                              self.props.out_channels), np.uint8),
                    np.zeros((0, NUM_STATS), np.float32))
        outs, stats = [], []
        b = self._co.engine.batch
        for i in range(0, len(frames), b):
            o, s = self._co.submit(self.slot, frames[i:i + b])
            outs.append(o)
            stats.append(s)
        return np.concatenate(outs), np.concatenate(stats)

    def snapshot(self) -> None:
        self._co.snapshot(self.slot)

    def reset(self) -> None:
        self._co.reset_slot(self.slot)

    def heatmap(self) -> np.ndarray:
        return self._co.heatmap(self.slot)

    def save(self, path: str) -> None:
        """Checkpoint THIS slot's streaming state — the file is
        ``DiPsEngine.save``-compatible, so a session can migrate between a
        dedicated server and a coalesced slot."""
        self._co.save_slot(self.slot, path)

    def load(self, path: str) -> None:
        self._co.load_slot(self.slot, path)


def _prometheus_text(m: dict) -> str:
    """Render a metrics() dict in Prometheus exposition format."""
    lines = []

    def emit(name, value, kind="counter", labels=""):
        lines.append(f"# TYPE dips_{name} {kind}")
        lines.append(f"dips_{name}{labels} {value}")

    for key, kind in (("connections", "counter"), ("requests", "counter"),
                      ("frames", "counter"), ("request_errors", "counter"),
                      ("rejected", "counter"), ("link_drops", "counter"),
                      ("takeovers", "counter"), ("autosaves", "counter"),
                      ("autorestores", "counter"),
                      ("motion_events", "counter"),
                      ("webhook_delivered", "counter"),
                      ("webhook_failed", "counter"),
                      ("webhook_dropped", "counter"),
                      ("active_sessions", "gauge"),
                      ("parked_sessions", "gauge"),
                      ("max_sessions", "gauge"), ("uptime_s", "gauge")):
        if key in m:
            emit(key, m[key], kind)
    if "latency_ms" in m:
        lat = m["latency_ms"]
        lines.append("# TYPE dips_request_latency_ms summary")
        for q in ("p50", "p90", "p99"):
            lines.append(
                f'dips_request_latency_ms{{quantile="{q}"}} {lat[q]}')
        lines.append(f"dips_request_latency_ms_count {lat['count']}")
    if m.get("coalesced"):
        emit("coalesce_dispatches", m.get("coalesce_dispatches", 0))
        emit("coalesce_mean_fill", m.get("coalesce_mean_fill", 0.0),
             "gauge")
    pooled = m.get("pooled_engines") or {}
    if pooled:
        # one TYPE line for the whole metric family — a repeated TYPE
        # makes the Prometheus text parser reject the entire scrape
        lines.append("# TYPE dips_pooled_engines gauge")
        for geom, cnt in pooled.items():
            lines.append(f'dips_pooled_engines{{geometry="{geom}"}} {cnt}')
    return "\n".join(lines) + "\n"


def _start_metrics_http(server: "DiPsServer", port: int, host: str):
    """Serve GET /metrics (Prometheus text format) for scraping."""
    import http.server

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path.rstrip("/") not in ("", "/metrics"):
                self.send_error(404)
                return
            body = _prometheus_text(server.metrics()).encode()
            self.send_response(200)
            self.send_header("Content-Type",
                             "text/plain; version=0.0.4; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet: scrapes are frequent
            pass

    httpd = http.server.ThreadingHTTPServer((host, port), Handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd


class DiPsServer:
    """Serves up to ``max_sessions`` concurrent clients on a TCP port, each
    with its own engine (private streaming state on the shared chip).

    ``coalesce=N`` switches to the shared stacked-stream dispatcher: N
    session slots on ONE :class:`StreamCoalescer` (see its docstring);
    every command keeps working, including per-slot ``save``/``load``
    (checkpoints are ``DiPsEngine``-format, so sessions migrate between
    dedicated and coalesced servers)."""

    def __init__(self, props: DiPsProperties,
                 height: Optional[int] = None, width: Optional[int] = None,
                 port: int = 0, host: str = "127.0.0.1", batch: int = 1,
                 backend: str = "auto", max_sessions: int = 1,
                 packed_wire: bool = False, coalesce: int = 0,
                 coalesce_window_ms: float = 2.0, coalesce_devices: int = 1,
                 input_layout: str = "planar",
                 metrics_port: Optional[int] = None,
                 autosave_dir: Optional[str] = None,
                 autosave_every: int = 256,
                 events: Optional[dict] = None,
                 event_webhook: Optional[str] = None,
                 downscale: int = 1,
                 auto_refresh: Optional[dict] = None):
        #: daemon-wide on-device input decimation (``--downscale K``):
        #: every session's engine analyzes at 1/K scale (k x k box mean
        #: inside the device layout prep — DiPsEngine.downscale).  Clients
        #: keep sending full-res frames; reply maps/stats are at the
        #: decimated geometry (``hello``'s config carries both).  Session
        #: geometry keys (pooling, flexible sizing) stay in INPUT dims.
        self.downscale = max(1, int(downscale))
        #: per-session motion-event segmentation (ops/events.py): a dict
        #: of MotionDetector kwargs (on_threshold may be "auto"; pixels is
        #: filled in per session from its geometry).  process replies gain
        #: ``events`` (closed this request) + ``event_open``; a graceful
        #: close flushes the open event into its reply.  None disables.
        self.event_cfg = dict(events) if events is not None else None
        if self.event_cfg is not None:
            # validate NOW: a bad threshold combination must refuse to
            # start the daemon, not error every process request after the
            # engine state already advanced
            from .ops.events import MotionDetector
            probe = dict(self.event_cfg)
            if probe.get("metric") == "changed_frac":
                probe.setdefault("pixels", 1)
            MotionDetector(**probe)
        #: per-session adaptive baseline refresh (ops/refresh.py): a dict
        #: of BaselineRefreshPolicy kwargs — each session gets its own
        #: policy over its reply stats, and a wholesale scene change on
        #: that camera re-pins ITS baseline (the automated SnapShot
        #: button; unattended fleet cameras are exactly the use case).
        #: The fired reply carries ``baseline_refresh``: the frame index.
        #: OVERALL method only; None disables.
        self.refresh_cfg = (dict(auto_refresh) if auto_refresh is not None
                            else None)
        if self.refresh_cfg is not None:
            from .properties import DiPsMethod
            if props.method is not DiPsMethod.OVERALL:
                raise ValueError(
                    "auto_refresh re-pins the OVERALL baseline; "
                    "method=per_frame has none")
            # validate NOW, same contract as event_cfg below
            from .ops.refresh import BaselineRefreshPolicy
            probe = dict(self.refresh_cfg)
            if probe.get("metric", "changed_frac") == "changed_frac":
                probe.setdefault("pixels", 1)
            probe.setdefault("cooldown", 0)
            BaselineRefreshPolicy(**probe)
        #: push alerts: every closed motion event is POSTed (JSON, async
        #: best-effort, bounded queue — see utils/webhook.py) to this URL,
        #: so a fleet gets notifications without polling process replies.
        self._webhook = None
        if event_webhook is not None:
            if self.event_cfg is None:
                raise ValueError("event_webhook requires events: nothing "
                                 "fires without a motion detector "
                                 "(--events)")
            from .utils.webhook import WebhookSender
            self._webhook = WebhookSender(
                event_webhook,
                on_result=lambda outcome: self._count(f"webhook_{outcome}"))
        #: crash-safety checkpoints for NAMED sessions: every
        #: ``autosave_every`` processed frames (and on graceful close) a
        #: session's streaming state is written to
        #: ``autosave_dir/<token>.npz`` (atomic tmp+rename); after a daemon
        #: restart, the first bind of that token restores it, so a fleet
        #: survives a crash with at most ``autosave_every`` frames of
        #: baseline drift instead of resuming fresh.  None disables.
        self.autosave_dir = autosave_dir
        self.autosave_every = max(1, int(autosave_every))
        if autosave_dir is not None:
            os.makedirs(autosave_dir, exist_ok=True)
            # a crash mid-autosave leaves an orphaned tmp file behind; the
            # '#' marker cannot appear in a quote()-escaped token, so these
            # are never live checkpoints.  Only sweep OLD ones: during a
            # fast restart the previous daemon can still be mid-save, and
            # deleting its in-flight tmp makes its os.replace fail.
            now = time.time()
            for stale in glob.glob(os.path.join(autosave_dir,
                                                "*.#tmp#*.npz")):
                try:
                    if now - os.path.getmtime(stale) > 60.0:
                        os.remove(stale)
                except OSError:
                    pass
        self._coalescer: Optional[StreamCoalescer] = None
        self._coalesce_cfg: Optional[dict] = None
        self._coalescers: dict = {}   # flexible mode: (h, w) -> coalescer
        self._props = props
        #: geometry-flexible daemon: no fixed height/width — each session's
        #: engine is sized from its FIRST frame (or checkpoint), and idle
        #: engines/coalescers pool per geometry.  One daemon serves a
        #: mixed camera fleet; with ``coalesce=N`` each geometry gets its
        #: own lazily-created stacked-stream coalescer (a stacked kernel
        #: shape is per geometry).
        self.flexible = height is None or width is None
        if coalesce > 0:
            if packed_wire:
                raise ValueError("packed_wire (device packing) is not "
                                 "available with coalesce; clients can "
                                 "still request host-packed masks")
            self._coalesce_cfg = dict(
                n_streams=coalesce, batch=batch, backend=backend,
                window_ms=coalesce_window_ms, n_devices=coalesce_devices,
                input_layout=input_layout, downscale=self.downscale)
            if not self.flexible:
                self._coalescer = StreamCoalescer(props, height, width,
                                                  **self._coalesce_cfg)
            self.engine = None  # sessions share the coalescers' engines
            max_sessions = max(int(max_sessions), coalesce)
        elif self.flexible:
            self._mk_engine = lambda h, w, p=None: DiPsEngine(
                p or props, h, w, batch=batch, backend=backend,
                packed_wire=packed_wire, input_layout=input_layout,
                downscale=self.downscale)
            self.engine = None
        else:
            self._mk_engine = lambda p=None: DiPsEngine(
                p or props, height, width, batch=batch, backend=backend,
                packed_wire=packed_wire, input_layout=input_layout,
                downscale=self.downscale)
            #: the default session engine (kept for embedding/back-compat)
            self.engine = self._mk_engine()
        self.max_sessions = max(1, int(max_sessions))
        self._sessions = threading.Semaphore(self.max_sessions)
        # Engine pool.  Anonymous engines return here when a session ends;
        # on a SINGLE-session server the lone engine unambiguously resumes
        # a reconnecting client, on a multi-session server pooled engines
        # are reset before reuse (no cross-client state leaks).  Clients
        # that want resume on a multi-session server tag requests with a
        # "session" token; those engines park in _named keyed by token.
        #: idle anonymous engines: a list in fixed mode, a per-geometry
        #: dict {(h, w): [engines]} on a flexible daemon
        self._pool = ({} if self.flexible
                      else ([] if self.engine is None else [self.engine]))
        self._named: dict = {}   # session token -> parked engine
        #: token -> live connection socket: a NEW connection with the same
        #: token kicks the old holder (latest-wins, device-shadow style)
        #: and waits for its state to park before resuming it
        self._active: dict = {}
        #: parked named sessions beyond this are evicted oldest-first
        self.max_named_sessions = 8 * self.max_sessions
        #: flexible-daemon bounds on idle device state under geometry
        #: churn: total idle pooled engines, and registered per-geometry
        #: coalescers (idle ones beyond the cap are evicted; live ones
        #: never are).  warm_geometries raises them as needed.
        self.max_pooled_engines = max(8, self.max_sessions)
        self.max_geometries = 8
        self._pool_lock = threading.Lock()
        self._threads: list = []
        #: live accepted sockets: shutdown() force-closes them so the
        #: port frees immediately (a lingering ESTABLISHED socket blocks
        #: a same-port rebind — the systemd fast-restart case)
        self._client_socks: set = set()
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((host, port))
        self._sock.listen(self.max_sessions)
        self.port = self._sock.getsockname()[1]
        self._wake_host = host if host not in ("", "0.0.0.0") \
            else "127.0.0.1"
        self._stop = threading.Event()
        self._accept_done = threading.Event()
        self._accepting = False
        self._accept_thread: Optional[threading.Thread] = None
        self._started = time.monotonic()
        # observability counters (served by the "metrics" command);
        # guarded by _metrics_lock, incremented on the session threads
        self._metrics_lock = threading.Lock()
        self._counters = {"connections": 0, "requests": 0, "frames": 0,
                          "request_errors": 0, "rejected": 0,
                          "active_sessions": 0,
                          # fleet-link health: abortive disconnects and
                          # latest-wins token takeovers (reconnect storms
                          # show up here before anywhere else)
                          "link_drops": 0, "takeovers": 0,
                          # crash-safety checkpoints written / sessions
                          # restored from one after a daemon restart
                          "autosaves": 0, "autorestores": 0,
                          # closed motion events across all sessions
                          # (served only when the daemon runs --events)
                          "motion_events": 0,
                          # adaptive baseline re-pins across all sessions
                          # (counts only when the daemon runs
                          # --auto-refresh)
                          "auto_refreshes": 0,
                          # --event-webhook delivery outcomes (stay zero
                          # without one configured)
                          "webhook_delivered": 0, "webhook_failed": 0,
                          "webhook_dropped": 0}
        # optional Prometheus scrape endpoint (GET /metrics)
        self._metrics_httpd = None
        self.metrics_port: Optional[int] = None
        if metrics_port is not None:
            self._metrics_httpd = _start_metrics_http(self, metrics_port,
                                                      host)
            self.metrics_port = self._metrics_httpd.server_address[1]
        import collections
        #: service time of the last 1024 process/process_batch requests
        #: (seconds; includes any coalescer wait), for latency percentiles
        self._latencies = collections.deque(maxlen=1024)

    #: named geometry shorthand accepted by warm_geometries / --warm
    GEOMETRY_NAMES = GEOMETRY_NAMES

    def warm_geometries(self, geometries) -> None:
        """Pre-build (and jit-compile) pooled engines for the given
        geometries so the FIRST camera of each resolution does not pay
        the compile latency (cold TPU compiles can take minutes on a
        busy compiler).  Each entry is "HxW" or a name ("480p", "720p",
        "1080p", "4k").  Flexible daemons pool the warmed engines per
        geometry; fixed daemons accept only their own geometry."""
        for g in geometries:
            h, w = parse_geometry(g)
            if self._coalesce_cfg is not None:
                # coalesced: create (or pick) the geometry's coalescer and
                # drive one dummy frame through a slot to compile its step
                if self._coalescer is not None:
                    ce = self._coalescer.engine
                    if (h, w) != (ce.in_height, ce.in_width):
                        raise ValueError(
                            f"warm geometry {h}x{w} != fixed server "
                            f"{ce.in_height}x{ce.in_width}")
                # warming N geometries implies keeping N alive
                self.max_geometries = max(self.max_geometries,
                                          len(geometries))
                co = self._co_for((h, w))
                slot = co.bind()
                try:
                    co.submit(slot, [np.zeros((h, w, 3), np.uint8)])
                finally:
                    co.release(slot)  # non-park release resets the slot
                log.info("warmed %dx%d", h, w)
                continue
            if not self.flexible:
                if (h, w) != (self.engine.in_height, self.engine.in_width):
                    raise ValueError(
                        f"warm geometry {h}x{w} != fixed server "
                        f"{self.engine.in_height}x{self.engine.in_width}")
                eng = self.engine
            else:
                eng = self._mk_engine(h, w)
            # one dummy frame drives the jit compile; reset clears state
            eng.process_frames(
                [np.zeros((h, w, 3), np.uint8)])
            eng.reset()
            if self.flexible:
                with self._pool_lock:
                    self.max_pooled_engines = max(self.max_pooled_engines,
                                                  len(geometries))
                    self._pool_idle_engine(eng)
            log.info("warmed %dx%d", h, w)

    def _count(self, key: str, n: int = 1) -> None:
        with self._metrics_lock:
            self._counters[key] += n

    def _observe_latency(self, seconds: float) -> None:
        with self._metrics_lock:
            self._latencies.append(seconds)

    def metrics(self) -> dict:
        """Daemon-level counters + live session/parked state (the `metrics`
        wire command returns exactly this)."""
        with self._metrics_lock:
            c = dict(self._counters)
            lats = sorted(self._latencies)
        with self._pool_lock:
            c["parked_sessions"] = len(self._named)
        c["max_sessions"] = self.max_sessions
        c["uptime_s"] = round(time.monotonic() - self._started, 3)
        c["coalesced"] = self._coalesce_cfg is not None
        c["flexible"] = self.flexible
        if self.flexible and self._coalesce_cfg is None:
            with self._pool_lock:
                c["pooled_engines"] = {f"{h}x{w}": len(v)
                                       for (h, w), v in self._pool.items()
                                       if v}
        if lats:
            def q(p):
                return round(1e3 * lats[min(len(lats) - 1,
                                            int(p * len(lats)))], 3)
            c["latency_ms"] = {"count": len(lats), "p50": q(0.50),
                               "p90": q(0.90), "p99": q(0.99),
                               "max": round(1e3 * lats[-1], 3)}
        if self._coalesce_cfg is not None:
            with self._pool_lock:
                cos = ([self._coalescer] if self._coalescer is not None
                       else list(self._coalescers.values()))
            disp = folded = 0
            for co in cos:
                with co._cv:
                    disp += co.dispatches
                    folded += co.frames_folded
            c["coalesce_dispatches"] = disp
            c["coalesce_mean_fill"] = (round(folded / disp, 3) if disp
                                       else 0.0)
        return c

    def serve_forever(self) -> None:
        log.info("serving on port %d (max %d sessions)", self.port,
                 self.max_sessions)
        self._accept_thread = threading.current_thread()
        self._accepting = True
        try:
            self._accept_loop()
        finally:
            # the listener must die HERE, on the accepting thread: a
            # close() from another thread while accept() is in flight
            # leaves the kernel socket alive (and LISTENING) until the
            # syscall returns, which blocks a same-port daemon restart
            try:
                self._sock.close()
            except OSError:
                pass
            self._accept_done.set()
        for th in self._threads:
            th.join(timeout=5.0)

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                self._sock.settimeout(0.5)
                client, addr = self._sock.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            if self._stop.is_set():  # shutdown()'s wake-up connection
                try:
                    client.close()
                except OSError:
                    pass
                break
            # brief grace so a just-closed session's slot can free up
            if not self._sessions.acquire(timeout=1.0):
                self._count("rejected")
                log.warning("rejecting %s: %d sessions busy", addr,
                            self.max_sessions)
                try:
                    with client:
                        _send(client, {"ok": False,
                                       "error": "server at session limit"})
                except OSError:
                    pass
                continue
            th = threading.Thread(target=self._session, args=(client, addr),
                                  daemon=True)
            self._threads = [t for t in self._threads if t.is_alive()]
            self._threads.append(th)
            th.start()

    def _co_for(self, geometry):
        """The coalescer a new session of ``geometry`` binds to: the
        daemon-wide one on a fixed server, a lazily-created per-geometry
        one on a flexible server.  Construction (an N-slot engine build +
        jit compile) runs OUTSIDE ``_pool_lock`` so concurrent binds,
        releases and metrics scrapes never stall behind it; a
        construction race keeps the first registered instance."""
        if self._coalescer is not None:
            return self._coalescer
        if geometry is None:
            raise ValueError(
                "session has no geometry yet - send a frame or load a "
                "checkpoint first (flexible daemon)")
        with self._pool_lock:
            co = self._coalescers.get(geometry)
        if co is not None:
            return co
        built = StreamCoalescer(self._props, geometry[0], geometry[1],
                                **self._coalesce_cfg)
        with self._pool_lock:
            co = self._coalescers.setdefault(geometry, built)
            evicted = (self._evict_idle_coalescers(keep=geometry)
                       if len(self._coalescers) > self.max_geometries
                       else [])
        if co is not built:
            built.shutdown()  # lost the construction race
        for victim in evicted:
            victim.shutdown()
        return co

    def _evict_idle_coalescers(self, keep) -> list:
        """Drop registered coalescers beyond ``max_geometries`` that have
        no bound slots, no queued work and no parked named sessions
        (geometry churn must not accumulate device state without bound).
        Call under ``_pool_lock``; returns the evicted instances for the
        caller to shut down outside it.  Live geometries are never
        evicted — the registry may exceed the cap while all are busy."""
        evicted = []
        parked = {id(v._co) for v in self._named.values()
                  if isinstance(v, _CoalescedSession)}
        for geom in list(self._coalescers):
            if len(self._coalescers) <= self.max_geometries:
                break
            if geom == keep:
                continue
            co = self._coalescers[geom]
            with co._cv:
                busy = bool(co._bound) or bool(co._pending)
            if busy or id(co) in parked:
                continue
            del self._coalescers[geom]
            evicted.append(co)
        if evicted:
            log.info("evicted %d idle geometry coalescer(s)", len(evicted))
        return evicted

    def _autosave_path(self, token: str) -> str:
        from urllib.parse import quote
        return os.path.join(self.autosave_dir,
                            quote(str(token), safe="") + ".npz")

    def _maybe_autosave(self, eng, n_frames: int = 0,
                        force: bool = False) -> None:
        """Crash-safety checkpoint for a named session.  Runs on the
        session's own thread right after its request completed, so the
        engine state is quiescent — never call under ``_pool_lock``."""
        tok = getattr(eng, "session_token", None)
        if self.autosave_dir is None or tok is None:
            return
        due = getattr(eng, "_autosave_due", 0) + n_frames
        eng._autosave_due = due
        if due < (1 if force else self.autosave_every):
            return  # force still skips when nothing changed since the last
        path = self._autosave_path(tok)
        # unique tmp per write: after a takeover TIMEOUT two threads can
        # briefly autosave the same token, and a fixed tmp name would let
        # their np.savez writes interleave into garbage that os.replace
        # then renames over the last good checkpoint.  The '#' marker
        # cannot collide with a quoted token (quote escapes '#').
        fd, tmp = tempfile.mkstemp(dir=self.autosave_dir, suffix=".npz",
                                   prefix=os.path.basename(path)[:-4]
                                   + ".#tmp#")
        os.close(fd)
        try:
            eng.save(tmp)
            os.replace(tmp, path)
            eng._autosave_due = 0
            self._count("autosaves")
        except Exception:  # a full disk must not kill the stream
            log.exception("autosave failed for session %r", tok)
            try:
                os.remove(tmp)
            except OSError:
                pass

    # -- per-session flicker analysis (ops/analysis.py) --------------------
    @staticmethod
    def _bind_flicker(eng, header) -> None:
        """Attach a FlickerAnalyzer to the session's engine when the bind
        request asks for one (``flicker_hz`` + ``flicker_fps``).  It rides
        the engine through park/resume like the motion detector; the map
        is NOT part of checkpoints (it is derived data — a restart starts
        its window fresh)."""
        hz = header.get("flicker_hz")
        if hz is None:
            if header.get("flicker_fps") is not None:
                raise ValueError("flicker_fps needs flicker_hz")
            return
        fps = header.get("flicker_fps")
        if fps is None:
            raise ValueError(
                "flicker_hz needs flicker_fps (the daemon cannot know a "
                "camera's frame rate)")
        old = getattr(eng, "_flicker", None)
        if old is not None:
            if (old.freq_hz, old.fps) != (float(hz), float(fps)):
                raise ValueError(
                    f"session already analyzes {old.freq_hz:g} Hz @ "
                    f"{old.fps:g} fps; reset it before binding "
                    f"{float(hz):g} Hz @ {float(fps):g} fps")
            return  # resume keeps the accumulated window
        from .ops.analysis import FlickerAnalyzer
        eng._flicker = FlickerAnalyzer(float(hz), float(fps),
                                       batch=eng.batch)

    # -- per-session motion events (ops/events.py) ------------------------
    def _detector_for(self, eng):
        """Lazily attach a MotionDetector to the session's engine; it
        parks/resumes with it, so an open event survives a reconnect."""
        det = getattr(eng, "_motion_det", None)
        if det is None:
            from .ops.events import MotionDetector
            cfg = dict(self.event_cfg)
            if cfg.get("metric") == "changed_frac":
                cfg.setdefault(
                    "pixels",
                    eng.props.analysis_pixels(eng.height, eng.width))
            det = MotionDetector(**cfg)
            eng._motion_det = det
        return det

    def _apply_events(self, eng, hdr, n_frames: int) -> None:
        """Segment this request's stats rows; annotate the reply with the
        events that closed and whether one is open."""
        if self.event_cfg is None:
            return
        det = self._detector_for(eng)
        stats = np.asarray(hdr["stats"], np.float32)
        closed = det.update(stats, start_index=eng.frame_index - n_frames)
        if closed:
            self._count("motion_events", len(closed))
            self._post_webhook(eng, closed)
        hdr["events"] = [e.to_dict() for e in closed]
        hdr["event_open"] = det.is_open

    # -- per-session adaptive baseline refresh (ops/refresh.py) -----------
    def _refresher_for(self, eng):
        """Lazily attach a BaselineRefreshPolicy to the session's engine;
        it parks/resumes with it, like the motion detector."""
        pol = getattr(eng, "_refresher", None)
        if pol is None:
            from .ops.refresh import BaselineRefreshPolicy
            cfg = dict(self.refresh_cfg)
            if cfg.get("metric", "changed_frac") == "changed_frac":
                cfg.setdefault(
                    "pixels",
                    eng.props.analysis_pixels(eng.height, eng.width))
            # cover the snapshot latency: the re-capture lands on the
            # NEXT dispatch, so up to one request's batch still diffs
            # against the old baseline
            cfg.setdefault("cooldown", cfg.get("persist", 3)
                           + 2 * max(1, eng.batch))
            pol = BaselineRefreshPolicy(**cfg)
            eng._refresher = pol
        return pol

    def _apply_refresh(self, eng, hdr, n_frames: int) -> None:
        """Feed this request's stats rows to the session's refresh policy;
        a trigger requests ``eng.snapshot()`` (takes effect next dispatch)
        and annotates the reply with the fired frame index."""
        if self.refresh_cfg is None:
            return
        pol = self._refresher_for(eng)
        start = eng.frame_index - n_frames
        fired = []
        for i, row in enumerate(hdr["stats"]):
            if pol.feed(start + i, row):
                fired.append(start + i)
                self._count("auto_refreshes")  # one per policy fire, so
                # the metric matches pol.refreshes even in large requests
        if fired:
            eng.snapshot()
            hdr["baseline_refresh"] = fired[-1]   # back-compat scalar
            hdr["baseline_refreshes"] = fired     # every fired index
            # the snapshot lands only at the NEXT dispatch (after this
            # whole request): re-base the cooldown on the request end so
            # the policy cannot re-trigger on its own landing latency
            pol.suppress_until(eng.frame_index + pol.cooldown)

    def _post_webhook(self, eng, events) -> None:
        """Fan closed events out to the --event-webhook URL (async,
        best-effort; outcomes land in the webhook_* metrics)."""
        if self._webhook is None or not events:
            return
        tok = getattr(eng, "session_token", None)
        for e in events:
            self._webhook.post({
                "type": "motion_event",
                "session": tok,
                "geometry": f"{eng.height}x{eng.width}",
                "port": self.port,
                "ts": time.time(),
                "event": e.to_dict(),
            })

    @staticmethod
    def _peek_geometry(path) -> Optional[tuple]:
        """(height, width) recorded in a checkpoint file, or None.
        Raises whatever ``np.load`` raises on an unreadable file — the
        caller decides whether that surfaces (explicit ``load``) or falls
        back to fresh state (autosave recovery)."""
        with np.load(str(path)) as z:
            if "geometry" in z.files:
                return tuple(int(v) for v in z["geometry"])
        return None

    def _try_autorestore(self, eng, token) -> bool:
        """Load ``token``'s last autosave into a freshly-bound engine (the
        daemon-restart resume path).  A stale/mismatched file logs and
        falls back to fresh state rather than failing the bind."""
        if self.autosave_dir is None:
            return False
        path = self._autosave_path(token)
        if not os.path.exists(path):
            return False
        try:
            eng.load(path)
            eng._autosave_due = 0
            self._count("autorestores")
            log.info("session %r restored from autosave (frame %d)",
                     token, eng.frame_index)
            return True
        except Exception as e:
            log.warning("session %r: autosave restore failed (%s): "
                        "starting fresh", token, e)
            eng._autosave_due = 0  # a recycled counter must not carry over
            eng._motion_det = None
            try:
                eng.reset()
            except Exception:
                log.exception("reset after failed restore")
            return False

    def _takeover_token(self, tok: str, client) -> None:
        """Latest-wins token semantics: if ``tok`` is live on another
        connection (a camera reconnecting before the server noticed the
        old link died), shut the old connection down and wait briefly for
        its session to PARK — binding before the park would hand this
        connection a fresh engine and strand the real streaming state."""
        with self._pool_lock:
            old = self._active.get(tok)
        if old is None or old is client:
            return
        self._count("takeovers")
        log.info("session %r taken over by a new connection", tok)
        try:
            old.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        deadline = time.monotonic() + 5.0
        while time.monotonic() < deadline:
            with self._pool_lock:
                if tok in self._named or self._active.get(tok) in (None,
                                                                   client):
                    return
            time.sleep(0.01)
        log.warning("session %r: previous holder did not park in time",
                    tok)

    def _bind_engine(self, token, geometry=None, roi=None):
        """Engine for a session, bound lazily at its FIRST request (the
        request carries the optional session token).  Named tokens resume
        their parked engine; anonymous sessions reuse a pooled engine —
        reset unless this is a single-session server, where resume is
        unambiguous and historical behaviour.  On a flexible daemon,
        ``geometry`` (from the first frame or checkpoint) sizes a new
        engine; pooling is per geometry.

        ``roi``: per-session analysis region — this session's engine gets
        ``props.with_roi(roi)`` (each fleet camera watches a different
        scene).  Roi'd engines never enter the anonymous pool (a pooled
        engine must carry exactly the daemon's props), and a parked named
        session only resumes under the SAME roi."""
        if roi is not None:
            roi = tuple(int(v) for v in roi)
        if self._coalesce_cfg is not None:
            if roi is not None:
                raise ValueError(
                    "per-session roi is not available on a coalescing "
                    "daemon (one stacked kernel is shared); start the "
                    "daemon with --roi for a fleet-wide region")
            with self._pool_lock:
                if token is not None and token in self._named:
                    sess = self._named.pop(token)
                    sess._co.rebind(sess.slot)
                    sess.session_token = token
                    return sess
            co = self._co_for(geometry)  # may build, outside the lock
            with self._pool_lock:
                try:
                    sess = _CoalescedSession(co, co.bind())
                except RuntimeError:
                    # every slot held by a parked named session: evict
                    # the oldest parked on THIS coalescer
                    victims = [k for k, v in self._named.items()
                               if v._co is co]
                    if not victims:
                        raise
                    old = self._named.pop(victims[0])
                    co.release(old.slot)
                    sess = _CoalescedSession(co, co.bind())
            sess.session_token = token
            if token is not None:  # daemon-restart resume (fresh slot)
                self._try_autorestore(sess, token)
            return sess
        eng = None
        resumed = False
        need_reset = token is not None or self.max_sessions > 1
        with self._pool_lock:
            if token is not None and token in self._named:
                eng = self._named.pop(token)
                if roi is not None and eng.props.roi != roi:
                    # silently swapping the region mid-session would make
                    # the event/stats stream incomparable across the swap
                    self._named[token] = eng  # leave it parked
                    raise ValueError(
                        f"session {token!r} is parked with roi "
                        f"{eng.props.roi}; reset it before binding with "
                        f"roi {roi}")
                need_reset = False  # resuming IS the point of the token
                resumed = True      # parked state is newer than any autosave
            elif self.flexible:
                if geometry is None:
                    raise ValueError(
                        "session has no geometry yet - send a frame or "
                        "load a checkpoint first (flexible daemon)")
                if roi is None:  # roi'd sessions never reuse pooled engines
                    lst = self._pool.get(geometry)
                    if lst:
                        eng = lst.pop()
            elif self._pool and roi is None:
                eng = self._pool.pop()
        if eng is None:
            # construction (a jit compile on a new geometry) runs OUTSIDE
            # the lock so concurrent sessions don't stall behind it
            p = None if roi is None else self._props.with_roi(roi)
            eng = (self._mk_engine(*geometry, p=p) if self.flexible
                   else self._mk_engine(p=p))
        elif need_reset or getattr(eng, "_pooled_from_named", False):
            # _pooled_from_named: an evicted/superseded NAMED session's
            # engine in the anonymous pool still holds that camera's state;
            # the single-session resume exception only covers the daemon's
            # own lone anonymous engine, never another token's.
            eng.reset()  # never hand one client another's state
            eng._autosave_due = 0  # ...nor another's unsaved-frame counter
            eng._motion_det = None  # ...nor another's open event
            eng._flicker = None     # ...nor another's flicker window
        eng._pooled_from_named = False
        eng.session_token = token
        if token is not None and not resumed:
            self._try_autorestore(eng, token)  # daemon-restart resume
        return eng

    def _release_engine(self, eng) -> None:
        token = getattr(eng, "session_token", None)
        if isinstance(eng, _CoalescedSession):
            with self._pool_lock:
                if token is not None:
                    old = self._named.pop(token, None)
                    if old is not None and old is not eng:
                        # duplicate token (camera reconnected while the
                        # old connection was still draining): the
                        # superseded parked session's slot must be
                        # freed, not leaked
                        old._co.release(old.slot)
                    self._named[token] = eng
                    eng._co.release(eng.slot, park=True)
                    while len(self._named) > self.max_named_sessions:
                        old = self._named.pop(next(iter(self._named)))
                        old._co.release(old.slot)  # reset + free
                else:
                    eng._co.release(eng.slot)
            return
        with self._pool_lock:
            if token is not None:
                old = self._named.pop(token, None)
                self._named[token] = eng
                if old is not None and old is not eng:
                    old._pooled_from_named = True
                    self._pool_idle_engine(old)  # superseded duplicate
                while len(self._named) > self.max_named_sessions:
                    victim = self._named.pop(next(iter(self._named)))
                    victim._pooled_from_named = True
                    self._pool_idle_engine(victim)
            else:
                self._pool_idle_engine(eng)

    def _pool_idle_engine(self, eng) -> None:
        """Return an idle engine to the anonymous pool (call under
        ``_pool_lock``).  Flexible daemons cap total pooled engines —
        geometry churn must not accumulate unbounded device state —
        evicting from the deepest per-geometry pool first (dropping the
        reference frees its device buffers)."""
        if eng.props != self._props:
            # a per-session-roi engine: never reusable anonymously (the
            # pool's contract is "exactly the daemon's props"); dropping
            # the reference frees its device buffers
            return
        if not self.flexible:
            self._pool.append(eng)
            return
        # pool keys are INPUT geometry (what a session's frames look
        # like); with daemon-wide downscale that differs from the
        # engine's analysis dims
        self._pool.setdefault((eng.in_height, eng.in_width), []).append(eng)
        total = sum(len(v) for v in self._pool.values())
        dropped = 0
        while total > self.max_pooled_engines:
            geom = max(self._pool, key=lambda g: len(self._pool[g]))
            self._pool[geom].pop(0)
            if not self._pool[geom]:
                del self._pool[geom]
            total -= 1
            dropped += 1
        if dropped:
            log.info("evicted %d idle pooled engine(s)", dropped)

    def _session(self, client: socket.socket, addr) -> None:
        # the engine binds INSIDE _serve_client; the holder hands it back
        # even when the connection dies mid-request (ConnectionResetError
        # etc.) — an abortive disconnect must park/pool the engine, never
        # leak it (or its coalescer slot)
        bound: list = []
        self._count("connections")
        self._count("active_sessions")
        with self._pool_lock:
            self._client_socks.add(client)
        try:
            with client:
                log.info("client %s", addr)
                try:
                    self._serve_client(client, bound)
                except (ConnectionResetError, BrokenPipeError) as e:
                    # routine for edge fleets (RST on cell links, token
                    # takeover kicks): one line, not a traceback
                    self._count("link_drops")
                    log.info("client %s link dropped (%s)", addr, e)
                except Exception:
                    # one bad/broken client must never kill the daemon
                    log.exception("client %s dropped", addr)
        finally:
            try:
                if bound:
                    self._release_engine(bound[0])
            except Exception:
                # release can touch the device (coalescer reset_stream);
                # a transient failure there must not skip the bookkeeping
                # below or the session slot leaks until restart
                log.exception("releasing engine for %s failed", addr)
            finally:
                with self._pool_lock:
                    self._client_socks.discard(client)
                    for tok in [t for t, c in self._active.items()
                                if c is client]:
                        del self._active[tok]
                self._count("active_sessions", -1)
                self._sessions.release()

    def _serve_client(self, client: socket.socket, bound: list):
        """Serve one connection.  The engine bound at the first request is
        appended to ``bound`` so _session can park it on ANY exit path,
        including a mid-request exception."""
        eng = None
        # periodic timeout so shutdown() can interrupt an idle connection
        client.settimeout(0.5)
        while not self._stop.is_set():
            try:
                msg = _recv(client)
            except socket.timeout:
                continue
            except (ValueError, json.JSONDecodeError) as e:
                log.warning("protocol error: %s", e)
                try:
                    _send(client, {"ok": False, "error": str(e)})
                except OSError:
                    pass
                return
            if msg is None:
                return
            header, payload = msg
            cmd = header.get("cmd")
            if eng is None:  # first request binds the session's engine
                token = header.get("session")
                tok = str(token) if token is not None else None
                geometry = None
                if cmd in ("process", "process_batch"):
                    shp = header.get("shape") or ()
                    if len(shp) >= 3:
                        try:
                            geometry = (int(shp[-3]), int(shp[-2]))
                        except (TypeError, ValueError) as e:
                            self._count("request_errors")
                            _send(client, {"ok": False,
                                           "error": f"bad shape: {e}"})
                            continue
                elif cmd == "load" and self.flexible:
                    try:  # peek the checkpoint's geometry to size the engine
                        geometry = self._peek_geometry(header["path"])
                        if geometry is not None and self.downscale > 1:
                            # checkpoints store ANALYSIS dims; sessions
                            # are sized by their input geometry
                            geometry = tuple(v * self.downscale
                                             for v in geometry)
                    except Exception as e:
                        self._count("request_errors")
                        _send(client, {"ok": False, "error": str(e)})
                        continue
                if self.flexible and geometry is None:
                    if tok is not None:
                        # a reconnect can race the old connection's park:
                        # kick + wait BEFORE the parked check, or the
                        # pre-bind hello below reports frame_index 0 and
                        # the client wrongly concludes its state is gone
                        self._takeover_token(tok, client)
                    with self._pool_lock:
                        parked = tok is not None and tok in self._named
                    if (not parked and tok is not None
                            and self.autosave_dir is not None
                            and cmd not in ("metrics", "close")):
                        # daemon restart: recover the session's geometry
                        # from its autosave so even a pre-bind hello binds,
                        # restores, and reports the TRUE cursor (a 0 here
                        # would make a resilient client resume fresh).
                        # metrics/close stay bind-free — a monitoring
                        # scrape must not trigger checkpoint IO + compile.
                        # A corrupt file (ANY load error, not just OSError)
                        # reads as no geometry: the session starts fresh
                        # instead of bricking the token's reconnect path.
                        try:
                            geometry = self._peek_geometry(
                                self._autosave_path(tok))
                            if geometry is not None and self.downscale > 1:
                                geometry = tuple(v * self.downscale
                                                 for v in geometry)
                        except Exception:
                            pass
                    if not parked and geometry is None:
                        # geometry-free commands answer without binding;
                        # state commands need a frame/checkpoint first
                        if cmd == "hello":
                            _send(client, {
                                "ok": True, "frame_index": 0,
                                "config": {
                                    "height": None, "width": None,
                                    "flexible": True, "roi": None,
                                    "downscale": self.downscale,
                                    "coalesced":
                                        self._coalesce_cfg is not None}})
                            continue
                        if cmd == "metrics":
                            self._count("requests")
                            _send(client, dict(self.metrics(), ok=True,
                                               frame_index=0))
                            continue
                        if cmd == "close":
                            _send(client, {"ok": True})
                            return
                roi = header.get("roi")
                if roi is not None:
                    try:
                        roi = tuple(int(v) for v in roi)
                        if len(roi) != 4:
                            raise ValueError
                    except (TypeError, ValueError):
                        self._count("request_errors")
                        _send(client, {"ok": False,
                                       "error": f"bad roi {header['roi']!r}"
                                                " (want [y0, x0, y1, x1])"})
                        continue
                if tok is not None:
                    self._takeover_token(tok, client)
                try:
                    eng = self._bind_engine(tok, geometry, roi)
                    bound.append(eng)
                except Exception as e:
                    self._count("request_errors")
                    _send(client, {"ok": False, "error": str(e)})
                    continue
                if tok is not None:
                    with self._pool_lock:
                        self._active[tok] = client
            self._count("requests")
            try:
                if header.get("flicker_hz") is not None \
                        or header.get("flicker_fps") is not None:
                    # (re-)attach the session's flicker analyzer: no-op
                    # when one with the same parameters is already bound,
                    # fresh after reset/load dropped it, an error on a
                    # parameter mismatch (clients carry the params on
                    # every request)
                    self._bind_flicker(eng, header)
                if cmd in ("process", "process_batch"):
                    n_frames = (1 if cmd == "process"
                                else int(header["shape"][0]))
                    self._count("frames", n_frames)
                if cmd == "metrics":
                    m = self.metrics()
                    m["frame_index"] = eng.frame_index
                    _send(client, dict(m, ok=True))
                elif cmd == "hello":
                    _send(client, {
                        "ok": True,
                        "frame_index": eng.frame_index,
                        "config": {
                            "height": eng.height, "width": eng.width,
                            "batch": eng.batch, "backend": eng.backend,
                            "method": eng.props.method.name,
                            "output": eng.props.output.name,
                            "roi": (list(eng.props.roi)
                                    if eng.props.roi else None),
                            # height/width above are the ANALYSIS dims
                            # (what replies are shaped as); with
                            # downscale > 1, frames must arrive at
                            # input_height/input_width
                            "downscale": self.downscale,
                            "input_height": getattr(eng, "in_height",
                                                    eng.height),
                            "input_width": getattr(eng, "in_width",
                                                   eng.width),
                            "coalesced": isinstance(eng, _CoalescedSession),
                            "auto_refresh": self.refresh_cfg is not None,
                        }})
                elif cmd == "process":
                    shape = tuple(header["shape"])
                    frame = np.frombuffer(payload, np.uint8).reshape(shape)
                    t0 = time.monotonic()
                    hdr, body = _process_reply(eng, [frame], header)
                    self._observe_latency(time.monotonic() - t0)
                    self._apply_events(eng, hdr, n_frames)
                    self._apply_refresh(eng, hdr, n_frames)
                    hdr["stats"] = hdr["stats"][0]
                    hdr["shape"] = hdr["shape"][1:]  # per-frame shape
                    _send(client, hdr, body)
                    fl = getattr(eng, "_flicker", None)
                    if fl is not None:
                        # after the reply: the analyzer is only read by a
                        # later "flicker" command, so its dispatch must
                        # not sit in this request's latency
                        fl.update(frame)
                    self._maybe_autosave(eng, n_frames)
                elif cmd == "process_batch":
                    shape = tuple(header["shape"])
                    frames = np.frombuffer(payload, np.uint8).reshape(shape)
                    t0 = time.monotonic()
                    hdr, body = _process_reply(eng, frames, header)
                    self._observe_latency(time.monotonic() - t0)
                    self._apply_events(eng, hdr, n_frames)
                    self._apply_refresh(eng, hdr, n_frames)
                    _send(client, hdr, body)
                    fl = getattr(eng, "_flicker", None)
                    if fl is not None:
                        fl.update(frames)  # post-reply, see "process"
                    self._maybe_autosave(eng, n_frames)
                elif cmd == "snapshot":
                    eng.snapshot()
                    _send(client, {"ok": True})
                elif cmd == "flicker":
                    fl = getattr(eng, "_flicker", None)
                    if fl is None:
                        raise ValueError(
                            "session has no flicker analyzer: bind with "
                            "flicker_hz + flicker_fps "
                            "(DiPsClient(flicker_hz=..., flicker_fps=...))")
                    amp = fl.amplitude().astype(np.float32)
                    body = amp.tobytes()
                    _send(client, {"ok": True, "shape": list(amp.shape),
                                   "freq_hz": fl.freq_hz,
                                   "frames": fl.frames_seen,
                                   "payload_len": len(body)}, body)
                elif cmd == "heatmap":
                    hm = eng.heatmap().astype(np.float32)
                    body = hm.tobytes()
                    _send(client, {"ok": True, "shape": list(hm.shape),
                                   "payload_len": len(body)}, body)
                elif cmd == "save":
                    eng.save(str(header["path"]))
                    _send(client, {"ok": True})
                elif cmd == "load":
                    eng.load(str(header["path"]))
                    # the restored cursor may jump anywhere: segmentation
                    # restarts (an open event cannot span a state swap)
                    eng._motion_det = None
                    eng._flicker = None  # rebound from the next request
                    _send(client, {"ok": True,
                                   "frame_index": eng.frame_index})
                elif cmd == "reset":
                    eng.reset()
                    eng._motion_det = None
                    eng._flicker = None  # rebound from the next request
                    tok = getattr(eng, "session_token", None)
                    if self.autosave_dir is not None and tok is not None:
                        # explicit state discard also discards the
                        # crash-safety checkpoint (a restart must not
                        # resurrect what the client reset)
                        eng._autosave_due = 0
                        try:
                            os.remove(self._autosave_path(tok))
                        except OSError:
                            pass
                    _send(client, {"ok": True})
                elif cmd == "close":
                    reply = {"ok": True}
                    tok = getattr(eng, "session_token", None)
                    det = getattr(eng, "_motion_det", None)
                    if det is not None and tok is None:
                        # anonymous close = end of stream: flush the open
                        # event into the goodbye (named sessions keep it
                        # open across park/resume instead)
                        flushed = det.flush()
                        reply["events"] = [e.to_dict() for e in flushed]
                        self._count("motion_events", len(flushed))
                        self._post_webhook(eng, flushed)
                    # a graceful goodbye flushes any unsaved tail first
                    self._maybe_autosave(eng, force=True)
                    # park BEFORE replying: when the client's close()
                    # returns, a reconnect is guaranteed to find the
                    # parked state (no release/rebind race)
                    self._release_engine(eng)
                    bound.clear()
                    eng = None
                    _send(client, reply)
                    return
                else:
                    _send(client, {"ok": False,
                                   "error": f"unknown cmd {cmd!r}"})
            except Exception as e:  # per-request isolation
                self._count("request_errors")
                log.exception("request failed")
                try:
                    _send(client, {"ok": False, "error": str(e)})
                except OSError:
                    return  # client gone mid-error: drop the connection

    def shutdown(self) -> None:
        self._stop.set()
        # Reading _accepting here is race-free: _stop is set first, and
        # _accept_loop checks _stop before every accept(), so if we read
        # False the loop either already exited or will exit before its
        # first accept — no syscall can be left in flight unseen.
        #
        # When shutdown() runs ON the accepting thread itself (a signal
        # handler suspending the accept loop — the daemon's SIGTERM path),
        # skip the wake/wait handshake: no accept syscall is in flight
        # while the handler runs, so closing the listener below genuinely
        # frees the port, and waiting on _accept_done would self-deadlock
        # (only this thread's serve_forever can set it) and burn the full
        # timeout on every daemon stop.
        on_accept_thread = (self._accept_thread is
                            threading.current_thread())
        if self._accepting and not on_accept_thread:
            # wake a blocked accept() NOW (the in-flight syscall keeps the
            # kernel socket listening even after close()), then wait for
            # the accepting thread to close the listener itself — the
            # port must be genuinely free when shutdown() returns, or a
            # same-port daemon restart races EADDRINUSE
            try:
                with socket.create_connection(
                        (self._wake_host, self.port), timeout=1.0):
                    pass
            except OSError:
                pass
            self._accept_done.wait(timeout=5.0)
        with self._pool_lock:
            cos = ([self._coalescer] if self._coalescer is not None
                   else list(self._coalescers.values()))
        for co in cos:
            co.shutdown()
        if self._metrics_httpd is not None:
            self._metrics_httpd.shutdown()
            self._metrics_httpd.server_close()
        try:
            self._sock.close()
        except OSError:
            pass
        # force-close live session sockets: their ESTABLISHED state would
        # otherwise hold TCP state against the freed port
        with self._pool_lock:
            socks = list(self._client_socks)
        for s in socks:
            try:
                s.shutdown(socket.SHUT_RDWR)
            except OSError:
                pass
            try:
                s.close()
            except OSError:
                pass
        if self._webhook is not None:
            # bounded flush: pending alerts get a moment to deliver, a
            # dead receiver cannot hold the daemon's stop hostage
            self._webhook.close(flush_timeout_s=2.0)


class DiPsClient:
    """Minimal client for :class:`DiPsServer`.

    ``session``: optional stable token (e.g. a camera id).  Requests carry
    it, and the server parks/resumes that session's streaming state across
    reconnects; without it, a multi-session server hands out fresh state
    per connection.

    ``roi``: optional per-session analysis region (y0, x0, y1, x1) — each
    camera in a fleet watches a different scene, so the rectangle rides
    the requests and the server binds THIS session's engine with it
    (statistics/heatmap/motion events reduce over it; maps stay
    full-frame).  Not available on request-coalescing daemons (their
    stacked kernel is shared — use the daemon-wide ``--roi`` there)."""

    def __init__(self, port: int, host: str = "127.0.0.1",
                 session: Optional[str] = None,
                 roi: Optional[Tuple[int, int, int, int]] = None,
                 flicker_hz: Optional[float] = None,
                 flicker_fps: Optional[float] = None):
        self.session = session
        self.roi = None if roi is None else tuple(int(v) for v in roi)
        #: per-session flicker analysis: the server streams a
        #: FlickerAnalyzer at flicker_hz over this session's frames
        #: (flicker_fps = the camera's frame rate, which the daemon
        #: cannot know); fetch the map with :meth:`flicker`
        self.flicker_hz = flicker_hz
        self.flicker_fps = flicker_fps
        #: motion-event annotations from the LAST process reply (populated
        #: only when the daemon runs with --events)
        self.last_events: list = []
        self.event_open: bool = False
        #: frame index where the LAST process reply re-pinned the baseline
        #: (--auto-refresh daemons), else None
        self.last_refresh: Optional[int] = None
        self._sock = socket.create_connection((host, port))

    def __enter__(self) -> "DiPsClient":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def _rpc(self, header: dict, payload: bytes = b"") -> Tuple[dict, bytes]:
        if self.session is not None:
            header = dict(header, session=self.session)
        if self.roi is not None:
            # consumed at first-request engine bind; inert afterwards
            header = dict(header, roi=list(self.roi))
        if self.flicker_hz is not None or self.flicker_fps is not None:
            header = dict(header, flicker_hz=self.flicker_hz,
                          flicker_fps=self.flicker_fps)
        if payload:
            header = dict(header, payload_len=len(payload))
        _send(self._sock, header, payload)
        resp = _recv(self._sock)
        if resp is None:
            raise ConnectionError("server closed")
        return resp

    def hello(self) -> dict:
        h, _ = self._rpc({"cmd": "hello"})
        return h

    def metrics(self) -> dict:
        """Daemon counters: uptime, connections/requests/frames served,
        errors, active/parked sessions."""
        h, _ = self._rpc({"cmd": "metrics"})
        if not h.get("ok"):
            raise RuntimeError(h.get("error"))
        return h

    @staticmethod
    def _decode_maps(h: dict, body: bytes) -> np.ndarray:
        shape = tuple(h["shape"])
        if h.get("packed"):  # bit-packed THRESHOLD masks (ops/wire.py)
            from .ops import wire
            hh, w = shape[-3], shape[-2]
            if h.get("padded"):  # device-packed padded planes, verbatim
                hp, wp = h["padded"]
                rows = np.frombuffer(body, np.uint8).reshape(
                    *shape[:-3], 1, hp // 8, wp)
                mask = wire.unpack_mask_host(rows, hh)[..., :w]
                return np.moveaxis(mask, -3, -1)
            rows = np.frombuffer(body, np.uint8).reshape(
                *shape[:-3], (hh + 7) // 8, w)
            return wire.unpack_mask_host(rows, hh)[..., None]
        return np.frombuffer(body, np.uint8).reshape(shape)

    def _note_events(self, h: dict) -> None:
        """On an --events daemon, every process reply carries the motion
        events that closed plus the open flag; mirror them here.  On an
        --auto-refresh daemon, ``last_refresh`` is the frame index where
        THIS reply re-pinned the session's baseline (None otherwise)."""
        if "events" in h:
            self.last_events = list(h["events"])
            self.event_open = bool(h.get("event_open"))
        self.last_refresh = h.get("baseline_refresh")

    def process(self, frame: np.ndarray, packed: bool = False
                ) -> Tuple[np.ndarray, np.ndarray]:
        """One-frame round trip.  ``packed=True`` asks the server to
        bit-pack THRESHOLD masks on the wire (8x smaller payload; ignored —
        and flagged off in the response — for other output modes).  On an
        ``--events`` daemon, ``self.last_events`` / ``self.event_open``
        reflect this reply's motion-event annotations."""
        h, body = self._rpc({"cmd": "process", "shape": list(frame.shape),
                             "packed": packed},
                            np.ascontiguousarray(frame).tobytes())
        if not h.get("ok"):
            raise RuntimeError(h.get("error"))
        self._note_events(h)
        return self._decode_maps(h, body), np.asarray(h["stats"], np.float32)

    def process_many(self, frames: np.ndarray, packed: bool = False
                     ) -> Tuple[np.ndarray, np.ndarray]:
        """Batched round trip: (N, H, W, 3) uint8 -> ((N, H, W, C) maps,
        (N, NUM_STATS) stats) in one request."""
        frames = np.ascontiguousarray(frames, np.uint8)
        h, body = self._rpc({"cmd": "process_batch",
                             "shape": list(frames.shape),
                             "packed": packed}, frames.tobytes())
        if not h.get("ok"):
            raise RuntimeError(h.get("error"))
        self._note_events(h)
        return self._decode_maps(h, body), np.asarray(h["stats"], np.float32)

    def snapshot(self) -> None:
        h, _ = self._rpc({"cmd": "snapshot"})
        if not h.get("ok"):
            raise RuntimeError(h.get("error"))

    def flicker(self) -> Tuple[np.ndarray, dict]:
        """This session's flicker amplitude map (H, W) f32 plus its
        metadata ({freq_hz, frames}); needs flicker_hz/flicker_fps."""
        h, body = self._rpc({"cmd": "flicker"})
        if not h.get("ok"):
            raise RuntimeError(h.get("error"))
        amp = np.frombuffer(body, np.float32).reshape(h["shape"])
        return amp, {"freq_hz": h["freq_hz"], "frames": h["frames"]}

    def reset(self) -> None:
        """Clear the session's streaming state (cursor, ring, baseline)."""
        h, _ = self._rpc({"cmd": "reset"})
        if not h.get("ok"):
            raise RuntimeError(h.get("error"))

    def save(self, path: str) -> None:
        h, _ = self._rpc({"cmd": "save", "path": path})
        if not h.get("ok"):
            raise RuntimeError(h.get("error"))

    def load(self, path: str) -> int:
        h, _ = self._rpc({"cmd": "load", "path": path})
        if not h.get("ok"):
            raise RuntimeError(h.get("error"))
        return int(h["frame_index"])

    def heatmap(self) -> np.ndarray:
        h, body = self._rpc({"cmd": "heatmap"})
        if not h.get("ok"):
            raise RuntimeError(h.get("error"))
        return np.frombuffer(body, np.float32).reshape(h["shape"])

    def close(self) -> None:
        try:
            h, _ = self._rpc({"cmd": "close"})
            if isinstance(h, dict):
                self._note_events(h)  # anonymous close flushes open events
        except ConnectionError:
            pass
        self._sock.close()


class ResilientDiPsClient:
    """Edge-camera client: :class:`DiPsClient` + automatic reconnection.

    Built for flaky links (cellular cameras, WAN backhaul): a connection
    failure mid-request reconnects with exponential backoff and resumes
    the parked session — a ``session`` token is therefore REQUIRED
    (resume is what makes reconnecting meaningful).  The INITIAL connect
    gets the same backoff: a camera that boots while the daemon is still
    coming up dials until it answers instead of dying at start-up.

    Streamed frames are accounted exactly-once against the server's
    session cursor: after a reconnect, ``hello`` reveals whether the
    in-flight frames were processed before the connection died.  If they
    never arrived they are resent transparently; if they WERE processed
    (the reply died on the wire) the client raises :class:`ReplyLost` —
    resending would double-process them — records them in
    ``dropped_replies``, and the next call continues the stream.  A
    server that lost the session's state entirely (daemon restart)
    resumes fresh with a warning.
    """

    def __init__(self, port: int, host: str = "127.0.0.1",
                 session: str = "", retries: int = 5,
                 backoff_s: float = 0.2, max_backoff_s: float = 5.0,
                 roi: Optional[Tuple[int, int, int, int]] = None,
                 flicker_hz: Optional[float] = None,
                 flicker_fps: Optional[float] = None):
        if not session:
            raise ValueError("ResilientDiPsClient requires a session token "
                             "(reconnects resume the parked session)")
        self.port, self.host, self.session = int(port), host, str(session)
        self.roi = None if roi is None else tuple(int(v) for v in roi)
        #: per-session flicker analysis, re-bound on every reconnect (the
        #: parked window itself survives with the named session)
        self.flicker_hz = flicker_hz
        self.flicker_fps = flicker_fps
        self.retries = int(retries)
        self.backoff_s, self.max_backoff_s = backoff_s, max_backoff_s
        #: frames whose processing is confirmed server-side
        self._cursor = 0
        #: frames processed by the server whose replies died on the wire
        self.dropped_replies = 0
        self._cli = None
        # the initial connect gets the same backoff as reconnects: an
        # edge camera often boots before (or during) a daemon restart
        self._cursor = self._dial()

    #: network failures worth a reconnect (ConnectionError/BrokenPipe/
    #: timeout are all OSError subclasses)
    _NET_ERRORS = (OSError,)

    def _dial(self) -> int:
        """Connect (with exponential backoff) + resume; returns the
        server's session cursor."""
        delay = self.backoff_s
        for attempt in range(self.retries + 1):
            try:
                self._cli = DiPsClient(self.port, self.host,
                                       session=self.session, roi=self.roi,
                                       flicker_hz=self.flicker_hz,
                                       flicker_fps=self.flicker_fps)
                return int(self._cli.hello().get("frame_index", 0))
            except self._NET_ERRORS:
                if attempt == self.retries:
                    break
                time.sleep(delay)
                delay = min(delay * 2, self.max_backoff_s)
        raise ConnectionError(
            f"could not connect to {self.host}:{self.port} after "
            f"{self.retries + 1} attempts")

    def _reconnect(self) -> int:
        """Drop the dead connection and dial again."""
        if self._cli is not None:
            try:
                self._cli._sock.close()
            except OSError:
                pass
        return self._dial()

    def process(self, frame: np.ndarray, packed: bool = False
                ) -> Tuple[np.ndarray, np.ndarray]:
        outs, stats = self.process_many(frame[None], packed=packed)
        return outs[0], stats[0]

    def process_many(self, frames: np.ndarray, packed: bool = False
                     ) -> Tuple[np.ndarray, np.ndarray]:
        frames = np.ascontiguousarray(frames, np.uint8)
        n = len(frames)
        attempts = 0
        while True:
            try:
                outs, stats = self._cli.process_many(frames, packed=packed)
                self._cursor += n
                return outs, stats
            except self._NET_ERRORS:
                attempts += 1
                if attempts > self.retries:
                    raise
                server_ci = self._reconnect()
                if server_ci >= self._cursor + n:
                    # the batch WAS processed; only the reply was lost
                    self._cursor = server_ci
                    self.dropped_replies += n
                    raise ReplyLost(n)
                if server_ci < self._cursor:
                    log.warning(
                        "session %r state lost server-side (cursor %d < "
                        "confirmed %d): resuming fresh", self.session,
                        server_ci, self._cursor)
                self._cursor = server_ci
                # not processed: loop resends the same frames

    def _retry(self, fn):
        """Run an IDEMPOTENT command, reconnecting on network failure."""
        attempts = 0
        while True:
            try:
                return fn(self._cli)
            except self._NET_ERRORS:
                attempts += 1
                if attempts > self.retries:
                    raise
                self._cursor = self._reconnect()

    @property
    def last_events(self) -> list:
        """Motion events from the last process reply (``--events``
        daemons).  Empty right after a reconnect until the next reply —
        an open event itself survives server-side with the parked
        session."""
        return self._cli.last_events if self._cli is not None else []

    @property
    def event_open(self) -> bool:
        return bool(self._cli is not None and self._cli.event_open)

    @property
    def last_refresh(self) -> Optional[int]:
        """Frame index where the last process reply re-pinned the baseline
        (``--auto-refresh`` daemons), else None."""
        return self._cli.last_refresh if self._cli is not None else None

    def hello(self) -> dict:
        return self._retry(lambda c: c.hello())

    def metrics(self) -> dict:
        return self._retry(lambda c: c.metrics())

    def snapshot(self) -> None:
        self._retry(lambda c: c.snapshot())

    def heatmap(self) -> np.ndarray:
        return self._retry(lambda c: c.heatmap())

    def save(self, path: str) -> None:
        self._retry(lambda c: c.save(path))

    def load(self, path: str) -> int:
        ci = self._retry(lambda c: c.load(path))
        self._cursor = int(ci)
        return int(ci)

    def reset(self) -> None:
        self._retry(lambda c: c.reset())
        self._cursor = 0

    def close(self) -> None:
        if self._cli is None:
            return
        try:
            self._cli.close()
        except self._NET_ERRORS:
            pass

    def __enter__(self) -> "ResilientDiPsClient":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def main(argv=None) -> int:
    from .cli import build_parser, props_from_args
    ap = argparse.ArgumentParser(parents=[build_parser()], add_help=False,
                                 conflict_handler="resolve")
    ap.add_argument("--port", type=int, default=7807)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--height", type=int, default=None,
                    help="fixed frame height; omit BOTH -h/-w for a "
                         "geometry-flexible daemon (each session sized "
                         "from its first frame; mixed camera fleets; "
                         "composes with --coalesce: one stacked "
                         "dispatcher per geometry)")
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--sessions", type=int, default=1,
                    help="max concurrent client sessions (each gets its "
                         "own engine state)")
    ap.add_argument("--packed-wire", action="store_true",
                    help="THRESHOLD only: bit-pack masks on the device "
                         "before the D2H copy (8x less transfer)")
    ap.add_argument("--coalesce", type=int, default=0, metavar="N",
                    help="share ONE stacked-stream kernel across N session "
                         "slots (concurrent requests fold into one device "
                         "dispatch; the many-camera deployment shape)")
    ap.add_argument("--coalesce-window-ms", type=float, default=2.0,
                    help="how long a request waits for co-tenant frames "
                         "before dispatching anyway")
    ap.add_argument("--coalesce-devices", type=int, default=1, metavar="D",
                    help="shard the coalesced stream slots over the first "
                         "D chips of the mesh (N must divide by D)")
    ap.add_argument("--input-layout", choices=("planar", "hwc"),
                    default="planar",
                    help="'hwc': upload raw frames and planarize ON DEVICE "
                         "(frees host CPU per frame; recommended for TPU "
                         "serving - wire frames are already HWC)")
    ap.add_argument("--metrics-port", type=int, default=None, metavar="P",
                    help="also serve Prometheus metrics on http://HOST:P"
                         "/metrics (0 = ephemeral port, printed at start)")
    ap.add_argument("--max-geometries", type=int, default=None, metavar="G",
                    help="flexible daemons: keep at most G idle per-"
                         "geometry coalescers / pooled engines alive under "
                         "geometry churn (default 8; live sessions are "
                         "never evicted)")
    ap.add_argument("--autosave", default=None, metavar="DIR",
                    help="crash-safety checkpoints: periodically save each "
                         "NAMED session's streaming state to DIR; after a "
                         "daemon restart, reconnecting sessions resume "
                         "from their last autosave instead of fresh")
    ap.add_argument("--autosave-every", type=int, default=256, metavar="N",
                    help="frames between a session's autosaves (a graceful "
                         "close always flushes)")
    ap.add_argument("--warm", default=None, metavar="GEOMS",
                    help="comma-separated geometries to pre-compile at "
                         "startup (HxW or 480p/720p/1080p/4k) so the "
                         "first camera of each resolution skips the jit "
                         "compile latency")
    ap.add_argument("--events", action="store_true",
                    help="per-session motion-event segmentation "
                         "(ops/events.py): process replies gain 'events' "
                         "(closed this request) and 'event_open'; the "
                         "motion_events counter appears in metrics")
    ap.add_argument("--event-on", default="auto", metavar="X|auto",
                    type=lambda s: s if s == "auto" else float(s),
                    help="event OPEN level; 'auto' (default) learns each "
                         "session's noise floor online — the right choice "
                         "for a mixed camera fleet")
    ap.add_argument("--event-off", type=float, default=None, metavar="X",
                    help="close level (fixed mode only; default half of "
                         "--event-on)")
    ap.add_argument("--event-metric", default="changed_frac",
                    choices=("mean_abs_diff", "max_abs_diff",
                             "changed_count", "changed_frac"))
    ap.add_argument("--event-min-frames", type=int, default=2, metavar="N")
    ap.add_argument("--event-cooldown", type=int, default=0, metavar="N")
    ap.add_argument("--event-webhook", default=None, metavar="URL",
                    help="POST every closed motion event to URL as JSON "
                         "(async best-effort with retries; outcomes in "
                         "the webhook_* metrics).  Requires --events")
    ap.add_argument("--auto-refresh", default=None,
                    metavar="FRAC[:PERSIST[:COOLDOWN]]",
                    help="per-session adaptive baseline refresh: re-pin a "
                         "session's snapshot when at least FRAC of its "
                         "analysis pixels stay changed for PERSIST frames "
                         "(default 3) — the automated SnapShot button for "
                         "unattended fleet cameras.  The fired reply "
                         "carries 'baseline_refresh' (frame index); "
                         "fires count in the auto_refreshes metric")
    from .utils.compilecache import (add_compile_cache_flag,
                                     apply_compile_cache_flag)
    add_compile_cache_flag(ap)
    args = ap.parse_args(argv)
    if args.event_webhook and not args.events:
        print("error: --event-webhook requires --events", file=sys.stderr)
        return 2
    if args.event_on == "auto" and args.event_off is not None:
        print("error: --event-off is computed in auto mode (estimated "
              "floor + margin/2) — drop it or use a fixed --event-on",
              file=sys.stderr)
        return 2
    auto_refresh = None
    if args.auto_refresh:
        from .ops.refresh import parse_auto_refresh_arg
        try:
            auto_refresh = parse_auto_refresh_arg(args.auto_refresh)
        except ValueError:
            print(f"error: bad --auto-refresh {args.auto_refresh!r} "
                  "(want FRAC[:PERSIST[:COOLDOWN]], e.g. 0.6:3:64)",
                  file=sys.stderr)
            return 2
    cache_dir = apply_compile_cache_flag(args)
    if cache_dir:
        print(f"compile cache: {cache_dir}", flush=True)
    try:
        props = props_from_args(args)
    except ValueError as e:  # e.g. a malformed/inverted --roi rectangle
        print(f"error: {e}", file=sys.stderr)
        return 2
    try:
        server = DiPsServer(props, args.height, args.width, port=args.port,
                            host=args.host, batch=args.batch,
                            backend=args.backend,
                            max_sessions=args.sessions,
                            packed_wire=args.packed_wire,
                            coalesce=args.coalesce,
                            coalesce_window_ms=args.coalesce_window_ms,
                            coalesce_devices=args.coalesce_devices,
                            input_layout=args.input_layout,
                            metrics_port=args.metrics_port,
                            autosave_dir=args.autosave,
                            autosave_every=args.autosave_every,
                            downscale=args.downscale,
                            events=(dict(on_threshold=args.event_on,
                                         off_threshold=args.event_off,
                                         metric=args.event_metric,
                                         min_frames=args.event_min_frames,
                                         cooldown=args.event_cooldown)
                                    if args.events else None),
                            event_webhook=args.event_webhook,
                            auto_refresh=auto_refresh)
        if args.max_geometries is not None:
            server.max_geometries = max(1, args.max_geometries)
            server.max_pooled_engines = max(server.max_pooled_engines,
                                            server.max_geometries)
        if args.warm:
            server.warm_geometries(args.warm.split(","))
    except ValueError as e:
        # configuration the flags alone cannot validate — an --roi larger
        # than --height/--width, packed-wire+coalesce, a --warm geometry
        # the roi does not fit — is a user error, not a traceback
        print(f"error: {e}", file=sys.stderr)
        return 2
    print(f"dips server on {args.host}:{server.port}", flush=True)
    if server.metrics_port is not None:
        print(f"metrics on http://{args.host}:{server.metrics_port}/metrics",
              flush=True)
    # graceful daemon shutdown on SIGTERM (systemd/k8s stop), not just ^C
    import signal

    def _term(signum, frame):
        server.shutdown()
    try:
        signal.signal(signal.SIGTERM, _term)
    except ValueError:
        pass  # non-main thread (embedded use): ^C/shutdown() still work
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
