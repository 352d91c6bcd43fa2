"""Benchmark harness: 1080p frames/sec/chip vs OpenCV-CPU absdiff.

Headline metric (BASELINE.json): sustained device throughput of the full
fused DiPs pipeline (uint8 in -> spatial median 3x3 -> temporal median of 4
-> diff vs snapshot -> sigmoid -> colorized uint8 out + stats) at 1080p on
one chip, against `cv2.absdiff` on the host CPU.

Methodology: the chip rate is measured with frames resident in HBM and a
`lax.fori_loop` of pipeline steps inside one jit — one dispatch, no host
round-trips — then a two-point fit removes the fixed dispatch overhead.
This matches the production shape (batched streaming, overlapped transfers)
and deliberately excludes this dev harness's tunneled host link (~0.2 GB/s,
an artifact of the remote-TPU relay, not of the design; a host-attached
v5e moves >10 GB/s over PCIe).  The CPU baseline gets the same courtesy:
frames pre-decoded in RAM, tight loop, no video decode.

Prints exactly ONE JSON line on stdout; diagnostics go to stderr.
"""

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_cpu_absdiff(frames, baseline, seconds=2.0):
    import cv2
    cv2.absdiff(frames[0], baseline)
    t0 = time.time()
    n = 0
    while time.time() - t0 < seconds:
        for f in frames:
            cv2.absdiff(f, baseline)
        n += len(frames)
    return n / (time.time() - t0)


def bench_device_pipeline(props, h, w, batch, iters=(10, 60)):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from dips_tpu.ops import pallas_fused, reference
    from dips_tpu.ops.reference import pad_geometry

    hp, wp = pad_geometry(h, w)
    t = props.temporal_size
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 256, (t + batch, 3, hp, wp), np.uint8))
    baseline = jnp.zeros((hp, wp), jnp.float32)
    heatmap = jnp.zeros((hp, wp), jnp.float32)
    flags = jnp.zeros((batch,), bool).at[0].set(True)
    valid = jnp.ones((batch,), bool)
    if jax.default_backend() == "cpu":
        step = reference.batch_step.__wrapped__  # interpreter would be unfair
    else:
        step = pallas_fused.batch_step.__wrapped__

    @jax.jit
    def loop(n, raw, baseline, flags, heatmap):
        def body(_, carry):
            bl, hm, acc = carry
            out, stats, bl, hm = step(props, h, w, raw, bl, flags, hm, valid)
            # consume outputs so nothing is dead-code-eliminated
            return bl, hm, acc + stats.sum() + out[0, 0, 0, 0].astype(jnp.float32)
        return lax.fori_loop(0, n, body, (baseline, heatmap, jnp.float32(0)))

    t0 = time.time()
    float(loop(2, raw, baseline, flags, heatmap)[2])
    log(f"compile+warmup: {time.time() - t0:.1f}s")

    times = []
    for n in iters:
        t0 = time.time()
        float(loop(n, raw, baseline, flags, heatmap)[2])
        times.append(time.time() - t0)
        log(f"  {n} steps x {batch} frames: {times[-1]:.3f}s")
    # two-point fit removes fixed dispatch overhead
    n1, n2 = iters
    per_step = (times[1] - times[0]) / (n2 - n1)
    fps = batch / per_step
    log(f"per-step {per_step * 1e3:.2f}ms -> {per_step / batch * 1e3:.3f} ms/frame")
    return fps


# The five BASELINE.json benchmark configs + the headline default.
PRESETS = {
    "headline-1080p": dict(h=1080, w=1920, method="overall"),
    "overall-480p": dict(h=480, w=854, method="overall"),
    "perframe-720p": dict(h=720, w=1280, method="per_frame"),
    "heatmap-1080p": dict(h=1080, w=1920, method="overall"),  # heatmap is
    # always accumulated by the fused kernel; same measurement surface
    "streaming-4k": dict(h=2160, w=3840, method="overall"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=sorted(PRESETS), default=None,
                    help="BASELINE.json benchmark config")
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--window", type=int, default=3)
    ap.add_argument("--temporal", type=int, default=4)
    args = ap.parse_args()

    from dips_tpu.properties import DiPsMethod, DiPsProperties
    method = DiPsMethod.OVERALL
    h, w = args.height, args.width
    name = "fused_pipeline"
    if args.preset:
        cfg = PRESETS[args.preset]
        h, w = cfg["h"], cfg["w"]
        method = DiPsMethod[cfg["method"].upper()]
        name = args.preset
    props = DiPsProperties(window_size=args.window,
                           temporal_size=args.temporal, method=method)
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 256, (h, w, 3), np.uint8) for _ in range(8)]
    cpu_fps = bench_cpu_absdiff(frames, frames[0])
    log(f"cv2.absdiff CPU baseline: {cpu_fps:.0f} fps @ {w}x{h}")

    import jax
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    fps = bench_device_pipeline(props, h, w, args.batch)
    log(f"fused pipeline device rate: {fps:.0f} fps/chip @ {w}x{h}")

    print(json.dumps({
        "metric": f"{h}p_{name}_fps_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / cpu_fps, 2),
    }))


if __name__ == "__main__":
    main()
