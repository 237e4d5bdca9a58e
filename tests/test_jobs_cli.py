"""Job-runner CLI test (subprocess — the real user surface)."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_jobs_cli_end_to_end(tmp_path):
    fixtures, warehouse = str(tmp_path / "fx"), str(tmp_path / "wh")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4",
               PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    proc = subprocess.run(
        [sys.executable, "-m", "etl_docker_spark.jobs",
         "--fixtures", fixtures, "--warehouse", warehouse, "--make-demo-fixtures"],
        capture_output=True, text=True, timeout=300, env=env,
        cwd=env["PYTHONPATH"])
    assert proc.returncode == 0, proc.stderr[-1500:]
    status = json.loads(proc.stdout.strip().splitlines()[-1])["status"]
    assert all(v == "ok" for v in status.values())
    assert os.path.isdir(f"{warehouse}/VENTAS")
    assert os.path.isdir(f"{warehouse}/_etl_log")
