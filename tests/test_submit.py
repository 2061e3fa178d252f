"""spark-submit --py-files smoke: the package ships as a zip, the job
runs in a fresh JVM/driver and reports zero false negatives."""

import json
import shutil
import subprocess
import zipfile
from pathlib import Path

REPO = Path("/root/repo")


def test_spark_submit_py_files(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pyspark

        spark_submit = str(Path(pyspark.__file__).parent / "bin" / "spark-submit")
    zip_path = tmp_path / "pfs.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for p in (REPO / "prefix_filter_spark").rglob("*.py"):
            zf.write(p, p.relative_to(REPO))
    out = subprocess.run(
        [
            spark_submit,
            "--master",
            "local[4]",
            "--py-files",
            str(zip_path),
            str(REPO / "tools" / "submit_job.py"),
            "--n-docs",
            "5000",
            "--checkpoint",
            str(tmp_path / "ckpt"),
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(tmp_path),  # NOT the repo root: the zip must provide the package
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["false_negatives"] == 0
    assert res["members_found"] == res["distinct_tokens"] > 0
