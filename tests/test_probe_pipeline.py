"""End-to-end core-loop test: build → persist → probe → write
(SURVEY §7.2 minimum slice; reference run_tests.sh:123-125 shape)."""

import glob
import json
import os

import pyarrow.parquet as pq


def test_build_persist_probe_write(ray_session, tmp_path):
    import ray.data as rd

    from presto_bloomfilter_ray import BloomFilter
    from presto_bloomfilter_ray.engine import SketchStore, build_sketch
    from presto_bloomfilter_ray.pipelines import probe_and_write
    from presto_bloomfilter_ray.sources import ensure_webpages, url_host

    web_dir = ensure_webpages(4000)
    store_root = str(tmp_path / "store")
    out_dir = str(tmp_path / "kept")

    # build a bloom over the hosts of 'en' pages, persist it
    web = rd.read_parquet(web_dir)
    en_hosts = web.filter(expr="lang == 'en'").map_batches(
        lambda b: b.append_column("host", url_host(b.column("url"))),
        batch_format="pyarrow",
    )
    bf = build_sketch(en_hosts, "host", lambda: BloomFilter(20_000, 0.001))
    store = SketchStore(store_root)
    store.persist(bf, "t/en_hosts")

    # probe the FULL table's hosts against it, write survivors
    full = web.map_batches(
        lambda b: b.append_column("host", url_host(b.column("url"))),
        batch_format="pyarrow",
    )
    input_paths = sorted(glob.glob(os.path.join(web_dir, "*.parquet")))
    summary = probe_and_write(full, "t/en_hosts", "host", out_dir,
                              store_root=store_root, run_id="t",
                              input_paths=input_paths)
    assert summary["rows_in"] == 4000
    # every en page's host must survive (no false negatives)
    kept = pq.read_table(out_dir).to_pandas()
    en_rows = web.filter(expr="lang == 'en'").count()
    assert (kept["lang"] == "en").sum() == en_rows
    assert summary["rows_kept"] == len(kept) >= en_rows
    # metrics record persisted
    rec = json.loads(store.get("metrics/t/probe/summary.json").decode())
    assert rec["rows_kept"] == summary["rows_kept"]
    assert rec["selectivity"] is not None


def test_probe_anti_mode(ray_session, tmp_path):
    import ray.data as rd

    from presto_bloomfilter_ray import BloomFilter
    from presto_bloomfilter_ray.engine import SketchStore, build_sketch
    from presto_bloomfilter_ray.pipelines import probe_and_write
    from presto_bloomfilter_ray.sources import ensure_webpages

    web_dir = ensure_webpages(2000)
    store = SketchStore(str(tmp_path / "s"))
    web = rd.read_parquet(web_dir)
    en = build_sketch(web.filter(expr="lang == 'en'"), "url",
                      lambda: BloomFilter(5000, 1e-9))
    store.persist(en, "t/en_urls")
    out_dir = str(tmp_path / "non-en")
    s = probe_and_write(web, "t/en_urls", "url", out_dir,
                        store_root=str(tmp_path / "s"), run_id="t", anti=True)
    n_en = web.filter(expr="lang == 'en'").count()
    # anti join: definite non-members only; FP could only shrink, p=1e-9
    assert s["rows_kept"] == 2000 - n_en


def test_probe_partitioned_output(ray_session, tmp_path):
    import glob

    import ray.data as rd

    from presto_bloomfilter_ray import BloomFilter
    from presto_bloomfilter_ray.engine import SketchStore, build_sketch
    from presto_bloomfilter_ray.pipelines import probe_and_write
    from presto_bloomfilter_ray.sources import ensure_webpages

    web_dir = ensure_webpages(2000)
    store = SketchStore(str(tmp_path / "s"))
    web = rd.read_parquet(web_dir)
    bf = build_sketch(web, "url", lambda: BloomFilter(5000, 1e-9))
    store.persist(bf, "t/all")
    out_dir = str(tmp_path / "by-lang")
    probe_and_write(web, "t/all", "url", out_dir,
                    store_root=str(tmp_path / "s"), run_id="t",
                    partition_cols=["lang"])
    parts = glob.glob(f"{out_dir}/lang=*")
    assert len(parts) >= 5  # hive layout, one dir per lang
