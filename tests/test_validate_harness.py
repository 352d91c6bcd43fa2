"""The on-silicon acceptance harness (`dips_tpu.validate`) is itself a
round artifact generator (VALIDATE_TPU_rN.json) — pin its case loop,
JSON artifact shape, and failure accounting on the fast XLA/CPU path so
a harness regression can't silently produce a green-but-empty artifact
on the chip.  (The numerics the harness checks are pinned elsewhere:
tests/test_pallas_vs_oracle.py on the interpreter, the committed
VALIDATE_TPU artifact on Mosaic.)"""

import json

from dips_tpu import validate


def test_quick_xla_matrix_and_json_artifact(tmp_path):
    path = tmp_path / "v.json"
    rc = validate.main(["--backend", "xla", "--quick",
                        "--json", str(path)])
    assert rc == 0
    doc = json.loads(path.read_text())
    assert doc["ok"] is True
    assert doc["failed"] == 0
    # quick = first 3 matrix cases; xla has one protocol (no ring/tail
    # split, no pallas-only gates)
    assert doc["passed"] == len(doc["cases"]) == 3
    names = [c["case"] for c in doc["cases"]]
    assert names == [n for n, _, _ in validate.CASES[:3]]
    for c in doc["cases"]:
        assert c["ok"] is True and "seconds" in c


def test_record_captures_failure():
    results = []
    validate._record(results, "boom", False, 0.0,
                     error=ValueError("bad lane"))
    (r,) = results
    assert r["ok"] is False
    assert "bad lane" in r["error"]
