"""spark-submit --py-files launch-path smoke (BASELINE.json north_rule:
"run via spark-submit --py-files on a multi-executor cluster").

The sandbox has no cluster manager, so the evidence is the REAL launch
artifact chain: ``scripts/submit.sh`` zips the package, ships it with
``--py-files``, and drives the same ``qcflow.cli`` entry a yarn/k8s
launch would — against a fresh JVM that imports qcflow ONLY from the
shipped zip (cwd moved away from the repo), which is exactly what breaks
when a module sneaks in a repo-relative path or an import-time Column.
"""

from __future__ import annotations

import json
import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUBMIT = os.path.join(REPO, "scripts", "submit.sh")


def test_spark_submit_py_files_end_to_end(tmp_path):
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = "8"
    env.pop("PYTHONPATH", None)  # qcflow must resolve from the --py-files zip

    gen = subprocess.run(
        ["bash", SUBMIT, "gen", "--rows", "500", "--out", str(tmp_path / "clips")],
        cwd=str(tmp_path),  # NOT the repo: the zip is the only qcflow source
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert gen.returncode == 0, gen.stderr[-2000:]

    run = subprocess.run(
        [
            "bash",
            SUBMIT,
            "run",
            "--clips",
            str(tmp_path / "clips" / "clips.parquet"),
            "--out",
            str(tmp_path / "qc"),
            "--approx-thresholds",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert run.returncode == 0, run.stderr[-2000:]
    # the CLI contract: one JSON result line on stdout
    line = [l for l in run.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["n_input"] == 500
    assert 0 < res["n_kept"] <= 500
    assert res["thresholds"]  # frozen-threshold artifact for --calib reuse
    # outputs a resumable run needs: kept/dropped/lineage + metrics
    for t in ("kept.parquet", "dropped.parquet", "lineage.parquet"):
        assert (tmp_path / "qc" / t).exists(), t
