"""SketchStore + checkpoint/resume contracts (persist/load parity with
run_tests.sh:124-125; resume per north_rule)."""

import json
import os

import pytest
import pyarrow as pa

from presto_bloomfilter_ray import BloomFilter, deserialize
from presto_bloomfilter_ray.engine import SketchStore


@pytest.fixture
def store(tmp_path):
    return SketchStore(str(tmp_path / "store"))


def test_put_get_roundtrip(store):
    store.put("k1", b"hello")
    assert store.get("k1") == b"hello"
    assert store.exists("k1")
    assert not store.exists("nope")


def test_null_key_noop_returns_true(store):
    # BloomFilterPersistScalarFunction.java: null URL → true, no-op
    assert store.put(None, b"x") is True


def test_persist_load_probe(store):
    # run_tests.sh:124-125 analog: persist, load, probe
    bf = BloomFilter(100)
    bf.put("robin")
    assert store.persist(bf, "demo/bf") is True
    loaded = store.load("demo/bf")
    assert loaded.might_contain("robin")
    assert not loaded.might_contain("john")


def test_load_and_merge_column_of_keys(store):
    # bloom_filter_load aggregation (BloomFilterLoad.java:30-39)
    for key, items in [("a", ["x"]), ("b", ["y"]), ("c", ["z"])]:
        store.persist(BloomFilter(100).update_arrow(
            __import__("pyarrow").array(items)), f"part/{key}")
    merged = store.load_and_merge([f"part/{k}" for k in "abc"])
    assert all(merged.might_contain(i) for i in "xyz")


def test_keys_prefix_and_escape(store):
    store.put("a/b/c", b"1")
    store.put("a/d", b"2")
    assert store.keys("a") == ["a/b/c", "a/d"]
    with pytest.raises(ValueError):
        store.put("../evil", b"x")


def test_atomic_write_no_partial_files(store):
    store.put("big", b"x" * 1_000_000)
    files = store.keys()
    assert files == ["big"]  # no .tmp- leftovers


class TestSuiteResume:
    @pytest.fixture(scope="class")
    def webdir(self):
        from presto_bloomfilter_ray.sources import ensure_webpages

        return ensure_webpages(4000)

    def test_resume_skips_completed_and_estimates_match(
        self, ray_session, webdir, tmp_path_factory
    ):
        from presto_bloomfilter_ray.pipelines import run_suite

        root = str(tmp_path_factory.mktemp("suite-store"))
        r1 = run_suite(webdir, store_root=root, run_id="t", n_hint=4000)
        assert r1["summary"]["resumed_partitions"] == 0
        parts = r1["summary"]["partitions"]

        # simulate a crash that lost some partitions: delete 1 checkpoint
        # commit marker (the partition is then recomputed from scratch)
        store = SketchStore(root)
        first_done = [k for k in store.keys("checkpoints/t/suite")
                      if k.endswith(".done")][0]
        store.delete(first_done)
        r2 = run_suite(webdir, store_root=root, run_id="t", n_hint=4000)
        assert r2["summary"]["resumed_partitions"] == parts - 1
        # identical estimates to the uninterrupted run — no double-count
        assert r2["summary"]["distinct_urls_hll"] == r1["summary"]["distinct_urls_hll"]
        assert r2["summary"]["rows"] == r1["summary"]["rows"]

    def test_incremental_ingest(self, ray_session, webdir, tmp_path_factory):
        """Content-based shard keys: growing the input dir reuses the
        existing shards' checkpoints and processes only the NEW files —
        daily-increment semantics."""
        import glob
        import os
        import shutil

        from presto_bloomfilter_ray.pipelines import run_suite

        files = sorted(glob.glob(os.path.join(webdir, "*.parquet")))
        assert len(files) >= 8
        grow_dir = str(tmp_path_factory.mktemp("grow"))
        for f in files[:4]:
            shutil.copy(f, grow_dir)
        root = str(tmp_path_factory.mktemp("inc-store"))
        r1 = run_suite(grow_dir, store_root=root, run_id="inc", n_hint=4000)
        assert r1["summary"]["partitions"] == 4

        for f in files[4:8]:
            shutil.copy(f, grow_dir)
        r2 = run_suite(grow_dir, store_root=root, run_id="inc", n_hint=4000)
        assert r2["summary"]["partitions"] == 8
        assert r2["summary"]["resumed_partitions"] == 4  # old shards skipped

        # equal to a from-scratch run over the full 8 files
        ref = run_suite(grow_dir, store_root=str(tmp_path_factory.mktemp("ref")),
                        run_id="ref", n_hint=4000)
        assert r2["summary"]["rows"] == ref["summary"]["rows"]
        assert r2["summary"]["distinct_urls_hll"] == ref["summary"]["distinct_urls_hll"]
        assert r2["sketches"]["kll_textlen"].n == ref["sketches"]["kll_textlen"].n

    def test_lineage_records_exactly_once(self, ray_session, webdir, tmp_path_factory):
        from presto_bloomfilter_ray.pipelines import run_suite

        root = str(tmp_path_factory.mktemp("suite-store2"))
        res = run_suite(webdir, store_root=root, run_id="lin", n_hint=4000)
        store = SketchStore(root)
        lineage_keys = [k for k in store.keys("lineage/lin/suite")]
        assert len(lineage_keys) == res["summary"]["partitions"]
        seen = set()
        for k in lineage_keys:
            rec = json.loads(store.get(k).decode())
            assert rec["partition"] not in seen
            seen.add(rec["partition"])
            assert rec["rows"] > 0 and rec["wall_s"] >= 0


def test_suite_per_lang_blooms_correct(ray_session, tmp_path):
    """The suite's grouped (per-lang) blooms have no false negatives and
    discriminate: hosts of other langs are mostly rejected."""
    import duckdb

    from presto_bloomfilter_ray.pipelines import run_suite
    from presto_bloomfilter_ray.sources import ensure_webpages

    web_dir = ensure_webpages(4000)
    root = str(tmp_path / "s")
    res = run_suite(web_dir, store_root=root, run_id="lb", n_hint=4000)
    sk = res["sketches"]
    hosts = duckdb.sql(f"""
        select lang, split_part(url, '/', 3) host
        from '{web_dir}/*.parquet'
    """).df()
    for lang in ("en", "zh", "da"):
        bloom = sk.get(f"lang_bloom/{lang}")
        if bloom is None:
            continue
        mine = set(hosts.loc[hosts["lang"] == lang, "host"])
        others = set(hosts.loc[hosts["lang"] != lang, "host"]) - mine
        assert all(bloom.might_contain(h) for h in mine)  # no false negatives
        if others:
            fp = sum(bloom.might_contain(h) for h in list(others)[:500]) / min(500, len(others))
            assert fp < 0.05  # p=0.01 + slack


class TestActorKVStore:
    """Named-actor network KV — the reference persist-service analog
    (server.go PUT/GET by key over the network), second backend behind
    the ibackend-style dispatch."""

    def test_roundtrip_and_dispatch(self, ray_session):
        from presto_bloomfilter_ray import BloomFilter
        from presto_bloomfilter_ray.engine import ActorKVStore, open_store

        store = open_store("actor://test-kv")
        assert isinstance(store, ActorKVStore)
        bf = BloomFilter(1000, 0.01)
        bf.update_arrow(pa.array(["x", "y"]))
        assert store.persist(bf, "demo/bloom")
        assert store.exists("demo/bloom")
        loaded = store.load("demo/bloom")
        assert loaded.might_contain("x") and not loaded.might_contain("zz")
        assert store.keys("demo/") == ["demo/bloom"]
        store.delete("demo/bloom")
        assert not store.exists("demo/bloom")
        with pytest.raises(FileNotFoundError):
            store.get("demo/bloom")
        assert store.put(None, b"ignored") is True  # null-URL parity

    def test_visible_across_workers(self, ray_session):
        """A sketch persisted by one Ray task must be loadable by
        another through the same named actor (the 'network KV from any
        worker' property the reference's HTTP service provided)."""
        import ray

        from presto_bloomfilter_ray import BloomFilter
        from presto_bloomfilter_ray.engine import open_store

        @ray.remote
        def writer():
            st = open_store("actor://xworker-kv")
            bf = BloomFilter(500, 0.01)
            bf.update_arrow(pa.array(["alpha", "beta"]))
            return st.persist(bf, "shared/bloom")

        @ray.remote
        def reader():
            st = open_store("actor://xworker-kv")
            sk = st.load("shared/bloom")
            return bool(sk.might_contain("alpha")) and not sk.might_contain("nope")

        assert ray.get(writer.remote())
        assert ray.get(reader.remote())

    def test_load_and_merge(self, ray_session):
        from presto_bloomfilter_ray import BloomFilter
        from presto_bloomfilter_ray.engine import open_store

        st = open_store("actor://merge-kv")
        for i, el in enumerate(["a", "b", "c"]):
            bf = BloomFilter(100, 0.01)
            bf.update_arrow(pa.array([el]))
            st.persist(bf, f"m/{i}")
        merged = st.load_and_merge(st.keys("m/"))
        assert all(merged.might_contain(e) for e in ["a", "b", "c"])
        assert not merged.might_contain("d")


def test_suite_runs_on_actor_kv_backend(ray_session):
    """The flagship suite is backend-agnostic: running it against the
    named-actor network KV (actor://) must produce the same estimates
    as the filesystem store."""
    from presto_bloomfilter_ray.pipelines import run_suite
    from presto_bloomfilter_ray.sources import ensure_webpages

    web = ensure_webpages(4000)
    res = run_suite(web, store_root="actor://suite-kv-test", run_id="akv",
                    n_hint=4000)
    s = res["summary"]
    assert s["rows"] == 4000
    assert abs(s["distinct_urls_hll"] - 4000) / 4000 < 0.05
    # lazy view loads through the same backend
    assert res["sketches"]["hll_url"].estimate() == s["distinct_urls_hll"]
    # resume works through the actor KV too
    res2 = run_suite(web, store_root="actor://suite-kv-test", run_id="akv",
                     n_hint=4000)
    assert res2["summary"]["resumed_partitions"] == res2["summary"]["partitions"]


def test_open_store_uri_dispatch(tmp_path):
    """open_store resolves pyarrow.fs URIs (file://...) and plain paths
    to the fs backend; round-trips bytes through both forms."""
    from presto_bloomfilter_ray.engine import SketchStore, open_store

    uri_store = open_store(f"file://{tmp_path}/uri")
    assert isinstance(uri_store, SketchStore)
    uri_store.put("k/v", b"payload")
    assert uri_store.get("k/v") == b"payload"
    plain = open_store(str(tmp_path / "plain"))
    plain.put("x", b"y")
    assert plain.keys() == ["x"]
    with pytest.raises(ValueError):
        plain.get("../../etc/passwd")  # key escape guard
