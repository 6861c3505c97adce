"""E2E `spark-submit --py-files` shipping test (north rule: the pipeline
ships as a zipped package to a cluster; reference deployment analogue is
the maven-built jar, `pom.xml`). Zips `mdbloom/` exactly as the
documented deploy command does, then runs `scripts/submit_demo.py`
through a real spark-submit with the repo stripped from the import path,
so every driver- AND executor-side `import mdbloom` must resolve from
the shipped zip."""

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SUBMIT), reason="no spark-submit")
def test_spark_submit_py_files_ships_package(tmp_path):
    zip_path = tmp_path / "mdbloom.zip"
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(os.path.join(REPO, "mdbloom")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    out_dir = tmp_path / "idx"
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH",)}  # the zip must be the ONLY source
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [SUBMIT, "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", str(zip_path),
         os.path.join(REPO, "scripts", "submit_demo.py"), str(out_dir)],
        capture_output=True, text=True, timeout=420,
        cwd=str(tmp_path), env=env)  # cwd outside the repo: no implicit import
    assert proc.returncode == 0, proc.stderr[-3000:]
    ok = [ln for ln in proc.stdout.splitlines()
          if ln.startswith("SUBMIT_DEMO_OK")]
    assert ok, proc.stdout[-2000:] + proc.stderr[-2000:]
    # the demo prints rows= and verified_hits=; both must be non-trivial
    fields = dict(kv.split("=") for kv in ok[0].split()[1:])
    # synthesize drops empty-text turns, so rows is slightly under n_turns
    assert 1900 <= int(fields["rows"]) <= 2000
    assert int(fields["verified_hits"]) > 0
