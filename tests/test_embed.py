"""Embedding-generation stage (functions/embed.py): deterministic
hashed projection exactness, actor reuse (model loads once per actor),
real-model gating, DuckDB oracle parity."""
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from presto_bloomfilter_ray.functions import DocumentEmbedder, embed_documents


def _ref_embed(text: str, dim: int) -> np.ndarray:
    """Per-occurrence byte-trigram feature hashing, slow reference."""
    out = np.zeros(dim, dtype=np.int64)
    b = text.encode("utf-8")
    for i in range(len(b) - 2):
        code = (b[i] << 16) | (b[i + 1] << 8) | b[i + 2]
        out[code % dim] += 1 if ((code // dim) & 1) == 0 else -1
    return out


def test_hashed_projection_exact():
    texts = ["hello world", "ab", "", "the quick brown fox", "aaaaaa",
             "hello world"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts)})
    emb = DocumentEmbedder(dim=16)(t)
    vals = np.asarray(emb.column("embedding").combine_chunks().flatten()
                      ).reshape(len(texts), 16)
    for i, s in enumerate(texts):
        assert vals[i].tolist() == _ref_embed(s, 16).tolist(), s
    # identical text → identical vector (determinism)
    assert vals[0].tolist() == vals[5].tolist()


def test_normalize_unit_vectors():
    t = pa.table({"text": pa.array(["hello world", ""])})
    emb = DocumentEmbedder(dim=8, normalize=True)(t)
    vals = np.asarray(emb.column("embedding").combine_chunks().flatten()
                      ).reshape(2, 8)
    assert abs(np.linalg.norm(vals[0]) - 1.0) < 1e-6
    assert np.linalg.norm(vals[1]) == 0.0  # all-zero stays zero


def test_real_model_requires_library():
    with pytest.raises(NotImplementedError, match="sentence-transformers"):
        DocumentEmbedder(model="all-MiniLM-L6-v2")


def test_actor_reuse_model_constructed_once_per_actor(ray_session):
    """The stage is an ACTOR pool: many batches, few constructions —
    #distinct actor tags ≤ concurrency while #batches ≫ concurrency."""
    import ray.data as rd

    n = 2000
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "text": [f"document number {i} text" for i in range(n)]})
    out = embed_documents(rd.from_pandas(df).repartition(8),
                          dim=8, concurrency=2, batch_size=100,
                          tag_actor=True).to_pandas()
    assert len(out) == n
    n_actors = out["_actor_id"].nunique()
    assert n_actors <= 2          # constructed once per actor, reused
    assert n / 100 > 2            # ... across far more batches than actors


def test_matches_duckdb_oracle(ray_session, sf_dir):
    import ray.data as rd

    dim = 16
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    emb = embed_documents(ds, dim=dim, concurrency=2)

    def unnest(b: pa.Table) -> pa.Table:
        n = b.num_rows
        vals = np.asarray(b.column("embedding").combine_chunks().flatten()
                          ).reshape(n, dim).astype(np.int64)
        doc = np.repeat(np.asarray(b.column("doc_id")), dim)
        idx = np.tile(np.arange(dim, dtype=np.int64), n)
        flat = vals.reshape(-1)
        keep = flat != 0
        return pa.table({"doc_id": pa.array(doc[keep]),
                         "dim_idx": pa.array(idx[keep]),
                         "val": pa.array(flat[keep])})

    mine = (emb.map_batches(unnest, batch_format="pyarrow")
            .to_pandas().sort_values(["doc_id", "dim_idx"])
            .reset_index(drop=True))
    con = duckdb.connect()
    ref = con.sql(f"""
        WITH pos AS (
          SELECT d.doc_id, d.text,
                 unnest(range(1, length(d.text) - 1)) AS i
          FROM '{sf_dir}/documents.parquet' d
          WHERE length(d.text) >= 3
        ),
        tri AS (
          SELECT doc_id,
                 unicode(substr(text, CAST(i AS INT), 1)) * 65536
               + unicode(substr(text, CAST(i AS INT) + 1, 1)) * 256
               + unicode(substr(text, CAST(i AS INT) + 2, 1)) AS code
          FROM pos
        )
        SELECT doc_id, CAST(code % {dim} AS BIGINT) AS dim_idx,
               CAST(SUM(CASE WHEN (code // {dim}) % 2 = 0
                             THEN 1 ELSE -1 END) AS BIGINT) AS val
        FROM tri GROUP BY doc_id, dim_idx HAVING val != 0
        ORDER BY doc_id, dim_idx
    """).df()
    assert mine["doc_id"].tolist() == ref["doc_id"].astype(int).tolist()
    assert mine["dim_idx"].tolist() == ref["dim_idx"].astype(int).tolist()
    assert mine["val"].tolist() == ref["val"].astype(int).tolist()
