"""Live preview mode: webcam -> pipeline -> window.

The capability equivalent of the reference's winit/egui live app
(``run_dips_app``, dips_alt/src/lib.rs:113-552) — TPU hosts are headless, so
the GUI collapses to a cv2.imshow preview with key controls:

  s = re-capture the snapshot baseline (the egui SnapShot button,
      dips_alt/src/lib.rs:296-298)
  q / ESC = quit

Parameter sweeps (the egui sliders that rebuilt the GPU pipeline per change,
dips_alt/src/lib.rs:267-293) are done by re-running with different CLI flags —
the same specialise-and-rebuild semantics.
"""

from __future__ import annotations

import sys

import cv2

from .models import DiPsEngine
from .properties import DiPsProperties
from .io.video import open_camera


def run_live(props: DiPsProperties, camera: int = 0, batch: int = 1,
             backend: str = "xla") -> int:
    try:
        reader = open_camera(camera)
    except Exception as e:
        print(f"no camera available: {e}", file=sys.stderr)
        return 1
    try:
        cv2.namedWindow("DiPs")
    except cv2.error as e:
        print(f"no display available for --live: {e}", file=sys.stderr)
        return 1

    engine = None
    try:
        while True:
            frame = reader.read()
            if frame is None:
                break
            if engine is None:
                h, w = frame.shape[:2]
                engine = DiPsEngine(props, h, w, batch=batch, backend=backend)
            outs, _stats = engine.process_batch([frame])
            cv2.imshow("DiPs", cv2.cvtColor(outs[0], cv2.COLOR_RGB2BGR))
            key = cv2.waitKey(1) & 0xFF
            if key in (ord("q"), 27):
                break
            if key == ord("s") and engine is not None:
                engine.snapshot()
        return 0
    finally:
        reader.close()
        cv2.destroyAllWindows()
