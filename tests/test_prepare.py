"""End-to-end prepare_corpus composition: monotone stages, determinism."""

import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def docs(ray_session, sf_dir):
    import ray

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text", "lang", "source"])


def test_prepare_monotone_and_deterministic(docs, tmp_path):
    from presto_bloomfilter_ray.pipelines import prepare_corpus

    out, metrics = prepare_corpus(
        docs, id_col="doc_id", text_col="text",
        work_dir=str(tmp_path / "a"))
    stages = [m["stage"] for m in metrics]
    assert stages == ["quality_gates", "exact_dedup", "minhash_dedup"]
    rows = [m["rows"] for m in metrics]
    assert all(r is not None for r in rows)
    assert rows == sorted(rows, reverse=True)  # each stage only drops
    assert out.count() == rows[-1]
    # deterministic: a second run returns the same surviving id set
    out2, metrics2 = prepare_corpus(
        docs, id_col="doc_id", text_col="text",
        work_dir=str(tmp_path / "b"))
    ids1 = sorted(r["doc_id"] for r in out.select_columns(["doc_id"]).take_all())
    ids2 = sorted(r["doc_id"] for r in out2.select_columns(["doc_id"]).take_all())
    assert ids1 == ids2
    assert [m["rows"] for m in metrics2] == rows


def test_prepare_url_stages(ray_session, tmp_path):
    import ray

    from presto_bloomfilter_ray.pipelines import prepare_corpus

    rows = []
    for i in range(200):
        host = f"h{i % 5}.example.com"
        rows.append({
            "doc_id": i,
            "url": f"https://{host}/p/{i}",
            "text": f"document body number {i} with enough words to pass "
                    f"the permissive gates and some variety {i * 7} {i * 13}",
        })
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out, metrics = prepare_corpus(
        ds, id_col="doc_id", text_col="text", url_col="url",
        blocked_hosts=["h0.example.com"], host_cap=10,
        work_dir=str(tmp_path))
    stages = [m["stage"] for m in metrics]
    assert stages == ["host_blocklist", "quality_gates", "exact_dedup",
                      "minhash_dedup", "host_cap"]
    got = out.take_all()
    # blocklist: no h0 urls survive
    assert all("h0.example.com" not in r["url"] for r in got)
    # cap: ≤ 10 docs per host, and the kept ones are the smallest ids
    from collections import Counter

    per_host = Counter(r["url"].split("/")[2] for r in got)
    assert all(v <= 10 for v in per_host.values())
    kept_ids = sorted(r["doc_id"] for r in got)
    assert kept_ids[0] in (1, 2, 3, 4)  # smallest surviving ids win the cap
    assert "_host" not in out.schema().names
