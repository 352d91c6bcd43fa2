"""Guards for the driver-facing artifacts: bench.py's one-JSON-line stdout
contract and __graft_entry__'s two hooks."""

import json
import os
import subprocess
import sys

import jax
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_prints_exactly_one_json_line():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    script = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.argv=['bench.py','--height','24','--width','48',"
        "'--batch','2','--temporal','2'];"
        f"exec(open({os.path.join(REPO, 'bench.py')!r}).read())"
    )
    r = subprocess.run([sys.executable, "-c", script], env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-500:]
    lines = [l for l in r.stdout.strip().splitlines() if l]
    assert len(lines) == 1, f"stdout must be ONE json line, got {lines}"
    payload = json.loads(lines[0])
    assert set(payload) == {"metric", "value", "unit", "vs_baseline"}
    assert payload["value"] > 0


def test_graft_entry_hooks():
    sys.path.insert(0, REPO)
    try:
        from __graft_entry__ import entry, dryrun_multichip
    finally:
        sys.path.remove(REPO)
    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert all(np.isfinite(np.asarray(x)).all() for x in out[1:2])
    dryrun_multichip(8)  # conftest provides 8 virtual CPU devices
