"""HTTP persist façade — wire parity with the reference
persist-service (server.go:30-57: PUT/GET /bloomfilter/<key>)."""

import urllib.error
import urllib.request

import pytest

from presto_bloomfilter_ray import BloomFilter, deserialize
from presto_bloomfilter_ray.engine import (
    HttpStore,
    SketchHTTPService,
    SketchStore,
    open_store,
)


@pytest.fixture()
def service(tmp_path):
    with SketchHTTPService(SketchStore(str(tmp_path / "store"))) as svc:
        yield svc


def test_put_get_roundtrip_raw_http(service):
    """A NON-engine client (bare urllib) can PUT and GET envelopes —
    the reference's external-consumer contract."""
    bf = BloomFilter(1000, 0.01)
    bf.update_arrow(__import__("pyarrow").array(["alpha", "beta"]))
    body = bf.serialize()
    url = f"{service.url}/bloomfilter/run1/url-filter"
    req = urllib.request.Request(url, data=body, method="PUT")
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
    with urllib.request.urlopen(url) as r:
        got = r.read()
    rt = deserialize(got)
    assert rt.might_contain("alpha") and rt.might_contain("beta")
    assert not rt.might_contain("definitely-not-present")


def test_get_missing_is_404(service):
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(f"{service.url}/bloomfilter/nope")
    assert ei.value.code == 404
    # bad route and escaping keys are rejected, not served
    with pytest.raises(urllib.error.HTTPError):
        urllib.request.urlopen(f"{service.url}/other/route")
    req = urllib.request.Request(
        f"{service.url}/bloomfilter/../escape", data=b"x", method="PUT")
    with pytest.raises(urllib.error.HTTPError) as ei2:
        urllib.request.urlopen(req)
    assert ei2.value.code in (400, 404)


def test_http_store_client_surface(service):
    """HttpStore presents the same duck-typed surface as every other
    backend: persist/load/load_and_merge/exists/delete/keys."""
    store = open_store(service.url)
    assert isinstance(store, HttpStore)
    import pyarrow as pa

    a = BloomFilter(1000, 0.01)
    a.update_arrow(pa.array(["x"]))
    b = BloomFilter(1000, 0.01)
    b.update_arrow(pa.array(["y"]))
    assert store.persist(a, "m/a") and store.persist(b, "m/b")
    assert store.exists("m/a") and not store.exists("m/zzz")
    assert store.keys("m") == ["m/a", "m/b"]
    merged = store.load_and_merge(["m/a", "m/b"])
    assert merged.might_contain("x") and merged.might_contain("y")
    # null-key put is a no-op returning True (reference null-URL rule)
    assert store.put(None, b"ignored") is True
    store.delete("m/a")
    assert not store.exists("m/a")
    with pytest.raises(FileNotFoundError):
        store.get("m/a")


def test_facade_over_actor_kv(ray_session):
    """The façade composes with the in-cluster actor KV backend too —
    any _StoreSugar backend can be served externally."""
    import pyarrow as pa

    from presto_bloomfilter_ray.engine import ActorKVStore

    backing = ActorKVStore("http-facade-test")
    with SketchHTTPService(backing) as svc:
        client = HttpStore(svc.url)
        bf = BloomFilter(100, 0.01)
        bf.update_arrow(pa.array(["via-http"]))
        client.persist(bf, "k1")
        # visible from the Ray side without HTTP
        assert backing.load("k1").might_contain("via-http")


def test_cli_serve_roundtrip(tmp_path):
    """`cli serve` starts the façade on the requested port and a bare
    client round-trips — no Ray session required."""
    import json
    import subprocess
    import sys
    import time

    import pyarrow as pa

    store_dir = str(tmp_path / "served")
    bf = BloomFilter(100, 0.01)
    bf.update_arrow(pa.array(["served-item"]))
    SketchStore(store_dir).persist(bf, "pre/existing")
    proc = subprocess.Popen(
        [sys.executable, "-m", "presto_bloomfilter_ray.cli", "serve",
         "--store", store_dir, "--port", "0"],
        stdout=subprocess.PIPE, text=True, cwd="/root/repo")
    try:
        line = proc.stdout.readline()
        url = json.loads(line)["url"]
        deadline = time.time() + 10
        client = HttpStore(url)
        while time.time() < deadline:
            try:
                assert client.load("pre/existing").might_contain("served-item")
                break
            except OSError:
                time.sleep(0.2)
        else:
            raise AssertionError("server never came up")
        b2 = BloomFilter(100, 0.01)
        b2.update_arrow(pa.array(["two"]))
        client.persist(b2, "new/key")
        assert SketchStore(store_dir).load("new/key").might_contain("two")
    finally:
        proc.terminate()
        proc.wait(timeout=10)
