"""End-to-end spark-submit --py-files test (BASELINE.json:6,14): package
the engine into a zip, submit scripts/crawl_job.py from a NEUTRAL cwd (so
imports can only come from the --py-files artifact), run 2 rounds, then
resume to 3 — all through the real submit path."""

from __future__ import annotations

import json
import os
import shutil
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def test_spark_submit_py_files(tmp_path, spark):
    from opps_feedcrawler_spark.sources.synth import gen_corpus

    # corpus + seeds on disk (what a real deployment hands the job)
    pages, seeds, robots = gen_corpus(n_hosts=8, n_pages=120, n_seeds=15, seed=5)
    pages_dir = str(tmp_path / "pages")
    spark.createDataFrame(pages).write.parquet(pages_dir)
    robots_dir = str(tmp_path / "robots")
    spark.createDataFrame(
        robots,
        schema="host string, crawl_delay double, "
        "rules array<struct<allow:boolean,prefix:string>>",
    ).write.parquet(robots_dir)
    seeds_file = tmp_path / "seeds.txt"
    seeds_file.write_text("# seeds\n" + "\n".join(seeds["url"]) + "\n")

    zip_path = str(tmp_path / "ofs.zip")
    subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "package.sh"), zip_path],
        check=True, capture_output=True, cwd=REPO,
    )
    assert os.path.getsize(zip_path) > 10_000

    wh = str(tmp_path / "wh")
    neutral_cwd = str(tmp_path)  # NOT the repo: imports must use the zip

    def submit(rounds: int) -> dict:
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)
        out = subprocess.run(
            [
                SPARK_SUBMIT,
                "--master", "local[4]",
                "--py-files", zip_path,
                "--conf", "spark.ui.enabled=false",
                os.path.join(REPO, "scripts", "crawl_job.py"),
                "--pages", pages_dir,
                "--seeds", str(seeds_file),
                "--robots", robots_dir,
                "--warehouse", wh,
                "--rounds", str(rounds),
            ],
            capture_output=True, text=True, timeout=420, cwd=neutral_cwd, env=env,
        )
        assert out.returncode == 0, out.stderr[-3000:]
        line = [
            l for l in out.stdout.splitlines() if l.startswith("CRAWL_JOB_RESULT ")
        ][-1]
        return json.loads(line[len("CRAWL_JOB_RESULT "):])

    r1 = submit(2)
    assert r1["snapshots"] == [0, 1]
    assert r1["metrics_last"]["schedule_rows"] > 0
    # resume: same warehouse, higher rounds → continues from snapshot 2
    r2 = submit(3)
    assert r2["snapshots"] == [0, 1, 2]
