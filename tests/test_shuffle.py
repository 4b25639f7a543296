"""Deterministic shuffled export: exact global order, rerun identity,
incomplete-directory detection."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from presto_bloomfilter_ray.functions import read_shuffled, shuffled_export
from presto_bloomfilter_ray.functions.sampling import SAMPLE_MULT, _MOD


def _ds(n=5_000, seed=3):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    ids = rng.permutation(n).astype(np.int64)
    df = pd.DataFrame({
        "doc_id": ids,
        "text": [f"doc-{d}" for d in ids],
    })
    return rd.from_arrow(pa.Table.from_pandas(df)).repartition(7), df


def _expected_order(df):
    h = (df["doc_id"].to_numpy(dtype=np.int64) * SAMPLE_MULT) % _MOD
    return df.assign(_h=h).sort_values(["_h", "doc_id"])["doc_id"].tolist()


def test_global_order_and_rerun_identity(ray_session, tmp_path):
    ds, df = _ds()
    out = str(tmp_path / "shuf")
    man = shuffled_export(ds, out, "doc_id", n_shards=16)
    assert man["rows"] == len(df)
    back = read_shuffled(out).to_pandas()
    assert back["doc_id"].tolist() == _expected_order(df)
    assert back["text"].tolist()[0] == f"doc-{back['doc_id'].iloc[0]}"
    # rerun into a second dir: byte-identical order
    ds2, _ = _ds()
    out2 = str(tmp_path / "shuf2")
    shuffled_export(ds2, out2, "doc_id", n_shards=4)  # different sharding
    back2 = read_shuffled(out2).to_pandas()
    assert back2["doc_id"].tolist() == back["doc_id"].tolist()


def test_incomplete_dir_detected(ray_session, tmp_path):
    import os

    ds, _ = _ds(n=500)
    out = str(tmp_path / "shuf3")
    shuffled_export(ds, out, "doc_id", n_shards=8)
    victims = sorted(p for p in os.listdir(out) if p.startswith("shard-"))
    os.remove(os.path.join(out, victims[0]))
    with pytest.raises(FileNotFoundError, match="incomplete"):
        read_shuffled(out)


def test_negative_id_rejected(ray_session, tmp_path):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array([-1], type=pa.int64())})
    with pytest.raises(Exception, match="non-negative"):
        shuffled_export(rd.from_arrow(t), str(tmp_path / "x"), "doc_id")


def test_rerun_invalidates_before_writing(ray_session, tmp_path):
    """A rerun removes the old manifest before any writes: a crash
    mid-rerun leaves the dir loudly unreadable, never a stale mix. A
    completed rerun with FEWER shards must not leave orphan files."""
    import os

    ds, df = _ds(n=800)
    out = str(tmp_path / "shuf-re")
    shuffled_export(ds, out, "doc_id", n_shards=8)
    ds2, _ = _ds(n=800)
    shuffled_export(ds2, out, "doc_id", n_shards=4)   # fewer shards
    files = [p for p in os.listdir(out) if p.startswith("shard-")]
    assert len(files) == 4                             # no orphans
    back = read_shuffled(out).to_pandas()
    assert back["doc_id"].tolist() == _expected_order(df)
