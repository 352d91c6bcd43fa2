"""Multi-host test worker: one process of a 2-process CPU jax.distributed
cluster (4 virtual devices each -> 8 global).  Launched by
tests/test_multihost.py; results land in an npz the parent compares
against a single-process 8-device run.

Usage: python tests/_mh_worker.py RANK NPROCS PORT OUTDIR [--checkpoint]
"""

import os
import sys


def make_clip(n=12, h=12, w=140, seed=0, moving=True):
    """Must match tests/conftest.make_clip (workers cannot import conftest
    without pulling in its CPU-forcing fixtures before jax.distributed)."""
    import numpy as np
    r = np.random.default_rng(seed)
    base = r.integers(0, 256, (h, w, 3), np.uint8)
    frames = np.empty((n, h, w, 3), np.uint8)
    for i in range(n):
        f = base.copy()
        if moving:
            y = (2 + i) % max(h - 4, 1)
            x = (3 + 2 * i) % max(w - 4, 1)
            f[y:y + 4, x:x + 4] = [250, 30, 30]
        frames[i] = f
    return frames


S_GLOBAL, BATCH, H, W = 8, 2, 16, 24
N_FRAMES = 4  # two lockstep batches


def main() -> int:
    rank, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    outdir = sys.argv[4]
    do_checkpoint = "--checkpoint" in sys.argv

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from dips_tpu.parallel import init_multihost, MultiHostStreamEngine
    from dips_tpu.properties import DiPsProperties, DiPsFilter

    info = init_multihost(f"127.0.0.1:{port}", nprocs, rank)
    assert info.process_index == rank
    assert info.global_device_count == 8, info

    props = DiPsProperties(window_size=3, temporal_size=2,
                           filter=DiPsFilter.UNFILTERED)
    eng = MultiHostStreamEngine(props, H, W, S_GLOBAL, batch=BATCH,
                                backend="xla")
    clips = {si: make_clip(n=N_FRAMES, h=H, w=W, seed=100 + si)
             for si in eng.local_stream_ids}

    outs, stats_all, gmeans = [], [], []
    for start in range(0, N_FRAMES, BATCH):
        feed = eng.local_frames_template()
        for si in eng.local_stream_ids:
            feed[si] = list(clips[si][start:start + BATCH])
        out, stats, gmean = eng.process_batch(feed)
        outs.append(out)
        stats_all.append(stats)
        gmeans.append(gmean)
        if do_checkpoint and start == 0:
            # per-host checkpoint round-trip mid-stream: a NEW engine on
            # each host restores its own shard, then continues bit-exactly
            path = os.path.join(outdir, f"ckpt_{rank}.npz")
            eng.save(path)
            eng = MultiHostStreamEngine(props, H, W, S_GLOBAL, batch=BATCH,
                                        backend="xla")
            eng.load(path)

    np.savez(os.path.join(outdir, f"rank{rank}.npz"),
             local_stream_ids=np.asarray(eng.local_stream_ids),
             out=np.concatenate(outs, axis=1),
             stats=np.concatenate(stats_all, axis=1),
             gmeans=np.asarray(gmeans),
             frame_cursors=np.asarray(
                 [eng.frame_cursors[i] for i in eng.local_stream_ids]))
    print(f"WORKER-{rank}-OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
