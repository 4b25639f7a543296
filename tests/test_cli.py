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


def test_cli_decontaminate(tmp_path):
    import duckdb

    # benchmark = 3 docs of the corpus itself -> exactly those (and any
    # doc sharing a 13-gram, i.e. none in the synthetic corpus) drop
    src = "/root/testdata/sf0.001/documents.parquet"
    bench = str(tmp_path / "bench.parquet")
    duckdb.sql(f"COPY (SELECT * FROM '{src}' WHERE doc_id % 17 = 0) "
               f"TO '{bench}' (FORMAT PARQUET)")
    n_bench = duckdb.sql(f"SELECT count(*) FROM '{bench}'").fetchone()[0]
    assert n_bench >= 2
    # fpp tight enough that bloom false positives are not a factor over
    # the corpus's ~50k gram probes (default 1e-4 would over-remove ~5)
    out = _run(["decontaminate", "--input", src, "--benchmark", bench,
                "--output", str(tmp_path / "clean"), "--unit", "ngram",
                "--fpp", "1e-9"])
    # no false negatives: every benchmark doc is itself contaminated and
    # must be gone; the synthetic corpus also shares some 13-token
    # templates ACROSS docs, so removed may exceed n_bench (real hits)
    assert out["removed"] >= n_bench
    assert out["kept"] == out["input_docs"] - out["removed"]
    kept_ids = set(duckdb.sql(
        f"SELECT doc_id FROM '{tmp_path / 'clean'}/*.parquet'").df()["doc_id"])
    bench_ids = set(duckdb.sql(
        f"SELECT doc_id FROM '{bench}'").df()["doc_id"])
    assert not (kept_ids & bench_ids)
    assert len(kept_ids) == out["kept"]
