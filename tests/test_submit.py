"""spark-submit --py-files deployment smoke test.

The north rule's execution mode is ``spark-submit --py-files
uniparser_spark.zip`` on a cluster.  This test proves the package is
genuinely zip-shippable: it stages ``submit_crawl.py`` + a freshly
zipped package in a directory OUTSIDE the repo (so nothing resolves
from the source tree), launches a real ``spark-submit`` subprocess
with a clean PYTHONPATH, runs a full multi-round crawl against a
Common-Crawl-shaped parquet table, and checks the extracted records
and the checkpointed manifest.

Runtime is one fresh JVM (~1 min); it is the only test that exercises
the actual cluster entry path rather than an in-process session.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pyarrow.dataset as ds
import pytest

REPO = Path(__file__).resolve().parent.parent


def _spark_submit() -> str:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    cand = Path(pyspark.__file__).parent / "bin" / "spark-submit"
    if cand.exists():
        return str(cand)
    pytest.skip("no spark-submit binary available")


def _zip_package(dest: Path) -> None:
    pkg = REPO / "uniparser_spark"
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for path in sorted(pkg.rglob("*.py")):
            zf.write(path, path.relative_to(REPO))


def test_spark_submit_py_files_crawl(spark, tmp_path):
    from uniparser_spark.testgen import generate_pages, seed_urls, storage_json

    n_hosts, n_details = 2, 40
    pages_path = tmp_path / "pages"
    # the shared session only PREPARES the input table; the crawl under
    # test runs in the spark-submit subprocess
    generate_pages(spark, n_hosts=n_hosts, n_details=n_details, partitions=4).write.parquet(
        str(pages_path)
    )
    n_pages = spark.read.parquet(str(pages_path)).count()

    stage = tmp_path / "stage"
    stage.mkdir()
    _zip_package(stage / "uniparser_spark.zip")
    shutil.copy(REPO / "tools" / "submit_crawl.py", stage / "submit_crawl.py")
    (stage / "rules.json").write_text(storage_json(n_hosts))
    (stage / "seeds.txt").write_text(
        "\n".join(seed_urls(n_hosts, n_details)) + "\n"
    )

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_MASTER", "SPARK_GRAFT_CPUS")
    }
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    state = tmp_path / "state"
    proc = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", "uniparser_spark.zip",
            "submit_crawl.py",
            "--pages", str(pages_path),
            "--rules", "rules.json",
            "--seeds", "seeds.txt",
            "--state", str(state),
            "--rounds", "10",
        ],
        cwd=stage,
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    rounds = [
        json.loads(line)
        for line in proc.stdout.splitlines()
        if line.startswith("{") and "scheduled" in line
    ]
    assert rounds, proc.stdout[-2000:]
    assert sum(r["scheduled"] for r in rounds) == n_pages

    # extracted records + resumable manifest landed in the state dir
    rec_files = sorted((state / "records").rglob("*.parquet"))
    records = ds.dataset([str(p) for p in rec_files]).to_table()
    assert records.num_rows == n_pages
    manifest = json.loads((state / "manifest.json").read_text())
    assert manifest["seen_total"] == n_pages
