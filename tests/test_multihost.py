"""Multi-host stream processing: a REAL 2-process jax.distributed CPU
cluster (4 virtual devices per process -> one 8-device global mesh) must
produce bit-identical outputs to a single-process 8-device run.

This validates the pod deployment path (parallel/multihost.py): global
mesh construction across processes, per-process stream feeding, the
cross-host psum for global stats, and per-host checkpoint/restore —
SURVEY.md §5 'Distributed comm' beyond-parity scale-out.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from dips_tpu.properties import DiPsProperties, DiPsFilter

from tests._mh_worker import BATCH, H, N_FRAMES, S_GLOBAL, W, make_clip

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "_mh_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _expected():
    """Single-process reference: all 8 streams on the test process's
    8-device mesh, same clips, same lockstep batches."""
    from dips_tpu.parallel import MultiStreamEngine
    props = DiPsProperties(window_size=3, temporal_size=2,
                           filter=DiPsFilter.UNFILTERED)
    eng = MultiStreamEngine(props, H, W, n_streams=S_GLOBAL, batch=BATCH,
                            backend="xla")
    clips = [make_clip(n=N_FRAMES, h=H, w=W, seed=100 + si)
             for si in range(S_GLOBAL)]
    outs, stats_all, gmeans = [], [], []
    for start in range(0, N_FRAMES, BATCH):
        feed = [list(c[start:start + BATCH]) for c in clips]
        out, stats, gmean = eng.process_batch(feed)
        outs.append(out)
        stats_all.append(stats)
        gmeans.append(gmean)
    return (np.concatenate(outs, axis=1), np.concatenate(stats_all, axis=1),
            np.asarray(gmeans))


def _run_cluster(tmp_path, extra=()):
    port = _free_port()
    env = dict(os.environ, PYTHONPATH=_REPO)
    env.pop("JAX_PLATFORMS", None)  # workers force CPU themselves
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(r), "2", str(port), str(tmp_path),
         *extra],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for r in range(2)]
    logs = []
    for r, p in enumerate(procs):
        out, _ = p.communicate(timeout=300)
        logs.append(out.decode(errors="replace"))
        assert p.returncode == 0, (
            f"worker {r} failed:\n{logs[r]}\n--- other ---\n"
            + (logs[0] if r else ""))
    return logs


@pytest.mark.parametrize("extra", [(), ("--checkpoint",)],
                         ids=["fresh", "checkpoint-roundtrip"])
def test_two_process_cluster_matches_single_process(tmp_path, extra):
    exp_out, exp_stats, exp_gmeans = _expected()

    _run_cluster(tmp_path, extra)

    seen = np.zeros(S_GLOBAL, bool)
    for r in range(2):
        z = np.load(tmp_path / f"rank{r}.npz")
        ids = z["local_stream_ids"]
        assert len(ids) == S_GLOBAL // 2  # each process owns half
        for k, si in enumerate(ids):
            assert not seen[si]
            seen[si] = True
            np.testing.assert_array_equal(z["out"][k], exp_out[si])
            np.testing.assert_allclose(z["stats"][k], exp_stats[si],
                                       atol=1e-4, rtol=1e-5)
        assert (z["frame_cursors"] == N_FRAMES).all()
        # the global mean rides a cross-PROCESS psum: both ranks must agree
        # with the single-process value
        np.testing.assert_allclose(z["gmeans"], exp_gmeans,
                                   atol=1e-4, rtol=1e-5)
    assert seen.all()  # the union of the two hosts covers every stream
