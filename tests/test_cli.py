"""CLI entrypoint smoke (ray-job-submit shape): gen → suite → dedup."""

import json
import subprocess
import sys


def _run(args):
    out = subprocess.run(
        [sys.executable, "-m", "presto_bloomfilter_ray.cli", *args],
        cwd="/root/repo", capture_output=True, text=True, timeout=240,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cli_gen_suite_dedup(tmp_path):
    gen = _run(["gen", "--rows", "2000", "--out", str(tmp_path / "web")])
    assert gen["rows"] == 2000

    suite = _run(["suite", "--input", gen["path"],
                  "--store", str(tmp_path / "store"),
                  "--run-id", "cli", "--n-hint", "2000"])
    assert suite["rows"] == 2000
    assert suite["partitions"] > 0

    dd = _run(["dedup", "--input", "/root/testdata/sf0.001/documents.parquet",
               "--output", str(tmp_path / "dedup"), "--method", "exact"])
    assert dd["kept"] > 0
