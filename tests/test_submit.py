"""The north-rule deployment shape: ``spark-submit --py-files sage_spark.zip``.

The e2e test copies jobs/run_kg.py into a directory that does NOT contain
the package, zips sage_spark/, and submits — so the import can only resolve
from ``--py-files``, and the session must come up under spark-submit's
``--master`` / ``--conf`` (build_spark must leave both alone when launched
by spark-submit; sage_spark/session.py). The unit tests pin that decision:
``.master()`` set in app code silently overrides ``--master``, which would
force a YARN/k8s submission back to local mode, and a shuffle-partition
fallback computed from the driver host's core count would pin a
1000-executor job to ~32 partitions.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

from sage_spark.session import _under_spark_submit, resolve_session_shape

REPO = Path(__file__).resolve().parents[1]
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def test_resolve_session_shape_standalone() -> None:
    master, shuffle, submitted = resolve_session_shape(None, None, {"SPARK_GRAFT_CPUS": "7"})
    assert (master, shuffle, submitted) == ("local[7]", 7, False)
    # explicit arguments always win
    master, shuffle, submitted = resolve_session_shape("local[2]", 3, {"SPARK_GRAFT_CPUS": "7"})
    assert (master, shuffle, submitted) == ("local[2]", 3, False)


def test_resolve_session_shape_under_submit() -> None:
    env = {"PYSPARK_GATEWAY_PORT": "50000", "SPARK_GRAFT_CPUS": "7"}
    # the submit command line governs: nothing pinned in code
    assert resolve_session_shape(None, None, env) == (None, None, True)
    # an explicit caller request still wins even under submit
    master, shuffle, _ = resolve_session_shape("local[2]", 3, env)
    assert (master, shuffle) == ("local[2]", 3)
    assert _under_spark_submit({"PYSPARK_GATEWAY_SECRET": "x"})
    assert not _under_spark_submit({})


def test_spark_submit_py_files_e2e(tmp_path: Path) -> None:
    if not Path(SPARK_SUBMIT).exists():
        pytest.skip("spark-submit not available on this host")

    zip_path = tmp_path / "sage_spark.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for py in sorted((REPO / "sage_spark").rglob("*.py")):
            zf.write(py, py.relative_to(REPO))
    job = tmp_path / "run_kg.py"
    shutil.copy(REPO / "jobs" / "run_kg.py", job)
    store = tmp_path / "store"

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zip_path),
            str(job),
            "--synthetic", "300",
            "--store", str(store),
            "--run-id", "sub1",
            "--run-ts", "2026-05-01T00:00:00+00:00",
        ],
        capture_output=True,
        text=True,
        timeout=500,
        cwd=tmp_path,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("run sub1:")][-1]
    counts = dict(kv.split("=") for kv in line.split(": ", 1)[1].split())
    assert int(counts["documents"]) > 0
    assert int(counts["facts_current"]) > 0
    assert any((store / "facts").rglob("*.parquet"))
