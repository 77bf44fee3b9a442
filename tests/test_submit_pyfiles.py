"""north_rule contract: the pipeline runs via ``spark-submit --py-files``
with the package shipped as a zip — i.e. with NO repo checkout visible to
the entry script (the script is copied outside the repo, so its repo-root
``sys.path`` insert points nowhere useful and every ``dupers_spark``
import must resolve from the zip, exactly as on a real cluster).
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_with_py_files_zip():
    with tempfile.TemporaryDirectory() as td:
        zip_base = os.path.join(td, "dupers_spark")
        shutil.make_archive(zip_base, "zip", REPO, "dupers_spark")
        script = os.path.join(td, "run_pipeline_ext.py")
        shutil.copy(os.path.join(REPO, "jobs", "run_pipeline.py"), script)
        wh = os.path.join(td, "wh")
        out = subprocess.run(
            [
                "spark-submit", "--master", "local[4]",
                "--conf", "spark.sql.shuffle.partitions=8",
                "--conf", "spark.ui.enabled=false",
                "--py-files", zip_base + ".zip",
                script, "--n-images", "200", "--warehouse", wh,
            ],
            capture_output=True, text=True, timeout=600, cwd=td,
        )
        assert out.returncode == 0, out.stderr[-3000:]
        rep = json.loads(out.stdout.strip().splitlines()[-1])
        # planted structure: n/10 group clusters + 1 flood + 3n/10 singletons
        assert rep["images"] == 200
        assert rep["clusters"] == 200 // 10 + 1 + 3 * 200 // 10


if __name__ == "__main__":
    test_spark_submit_with_py_files_zip()
    print("ok")
