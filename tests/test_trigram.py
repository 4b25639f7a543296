"""Trigram substring index: exact LIKE parity, no false negatives,
short-needle fallback, rebuild invalidation."""
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from presto_bloomfilter_ray.functions import TrigramIndex


def _docs(n=800, seed=6):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    words = ["alpha", "bravo", "charlie", "delta", "needle", "haystack",
             "quantum", "ray", "data", "searchable", "xylophone"]
    texts = [" ".join(rng.choice(words, rng.integers(3, 30)))
             for _ in range(n)]
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "text": texts})
    return rd.from_arrow(pa.Table.from_pandas(df)).repartition(5), df


@pytest.mark.parametrize("needle", ["needle", "quantum ray",
                                    "xylophone", "zzz-not-there"])
def test_matches_like_oracle(ray_session, tmp_path, needle):
    ds, df = _docs()
    idx = TrigramIndex(str(tmp_path / "tri"), n_shards=8).build(ds)
    got = idx.search(ds, needle).to_pandas()
    ids = sorted(got["doc_id"]) if len(got) else []
    exp = duckdb.sql(
        "SELECT doc_id FROM df WHERE text LIKE '%' || ? || '%' "
        "ORDER BY doc_id", params=[needle]).df()
    assert ids == exp["doc_id"].astype(int).tolist()


def test_candidates_are_superset(ray_session, tmp_path):
    ds, df = _docs(n=300)
    idx = TrigramIndex(str(tmp_path / "tri2"), n_shards=4).build(ds)
    cand = idx.candidates("searchable")
    truth = set(df[df["text"].str.contains("searchable")]["doc_id"])
    assert truth <= set(cand.tolist())


def test_short_needle_full_scan(ray_session, tmp_path):
    ds, df = _docs(n=200)
    idx = TrigramIndex(str(tmp_path / "tri3"), n_shards=4).build(ds)
    assert idx.candidates("ab") is None
    got = idx.search(ds, "ra").to_pandas()
    exp = df[df["text"].str.contains("ra")]["doc_id"]
    assert sorted(got["doc_id"]) == sorted(exp)


def test_rebuild_invalidates(ray_session, tmp_path):
    import os

    ds, _ = _docs(n=100)
    root = str(tmp_path / "tri4")
    TrigramIndex(root, n_shards=8).build(ds)
    n_files_1 = len([p for p in os.listdir(root) if p.startswith("tri-")])
    ds2, df2 = _docs(n=100, seed=99)
    idx = TrigramIndex(root, n_shards=2).build(ds2)
    files = [p for p in os.listdir(root) if p.startswith("tri-")]
    assert len(files) <= 2 < n_files_1
    got = idx.search(ds2, "needle").to_pandas()
    exp = df2[df2["text"].str.contains("needle")]["doc_id"]
    assert sorted(got["doc_id"]) == sorted(exp)


@pytest.mark.parametrize("pattern", [
    "needle",                     # plain literal
    "quantum (ray|data)",         # literal prefix, alternation tail
    "xylo\\w+",                   # literal + word chars
    "(alpha|bravo) charlie",      # alternation head: literal ' charlie'
    "n[ae]edle",                  # class breaks the literal run
])
def test_regex_matches_oracle(ray_session, tmp_path, pattern):
    ds, df = _docs(n=400)
    idx = TrigramIndex(str(tmp_path / "trir"), n_shards=8).build(ds)
    got = idx.search_regex(ds, pattern).to_pandas()
    ids = sorted(got["doc_id"]) if len(got) else []
    exp = df[df["text"].str.contains(pattern, regex=True)]["doc_id"]
    assert ids == sorted(exp)


def test_regex_literal_extraction_sound(ray_session):
    from presto_bloomfilter_ray.functions.trigram import _required_literal

    # every returned literal must appear in every match of the pattern
    import re

    cases = ["abc(d|e)fgh", "foo\\d+bar", "x{2,}yzw", "a?bcd", "ab|cd"]
    rng = np.random.default_rng(0)
    for pat in cases:
        lit = _required_literal(pat)
        if lit is None:
            continue
        # probe with generated matches where feasible
        for probe in ["abcdfgh", "abcefgh", "foo7bar", "foo123bar",
                      "xxyzw", "xxxyzw", "bcd", "abcd", "ab", "cd"]:
            if re.fullmatch(pat, probe):
                assert lit in probe, (pat, lit, probe)


def test_append_and_crash_invisibility(ray_session, tmp_path):
    """Appended docs become searchable only after the gen commit;
    debris chunks above the manifest gen are invisible and repairable."""
    import json
    import os

    import ray.data as rd

    root = str(tmp_path / "tri-app")
    ds1, df1 = _docs(n=150, seed=1)
    idx = TrigramIndex(root, n_shards=4).build(ds1)
    # append a batch with DISTINCT ids containing a unique marker
    df2 = pd.DataFrame({
        "doc_id": np.arange(10_000, 10_050, dtype=np.int64),
        "text": [f"fresh zeppelin doc {i}" for i in range(50)],
    })
    idx.append(rd.from_arrow(pa.Table.from_pandas(df2)).repartition(2))
    both = rd.from_arrow(pa.Table.from_pandas(
        pd.concat([df1, df2], ignore_index=True))).repartition(3)
    got = idx.search(both, "zeppelin").to_pandas()
    assert sorted(got["doc_id"]) == df2["doc_id"].tolist()
    # old docs still found
    got1 = idx.search(both, "needle").to_pandas()
    exp1 = set(df1[df1["text"].str.contains("needle")]["doc_id"])
    assert set(got1["doc_id"]) == exp1
    # simulate a crashed append: hand-roll a gen-3 debris chunk
    import pyarrow.parquet as pq2

    debris = os.path.join(root, "tri-00001-g0003.parquet")
    pq2.write_table(pa.table({"tri": pa.array([1], type=pa.int32()),
                              "doc": pa.array([99], type=pa.int64())}),
                    debris)
    man = json.load(open(os.path.join(root, "manifest.json")))
    assert man["gen"] == 2            # debris gen 3 > manifest gen 2
    got2 = idx.search(both, "zeppelin").to_pandas()
    assert sorted(got2["doc_id"]) == df2["doc_id"].tolist()  # unchanged
    removed = idx.repair()
    assert removed == [debris] and not os.path.exists(debris)


def test_regex_inline_ignorecase_no_false_negatives(ray_session, tmp_path):
    """A global '(?i)' pattern must NOT be literal-pruned: docs whose
    only hits are case variants of the extracted literal still match."""
    import ray.data as rd

    from presto_bloomfilter_ray.functions.trigram import _required_literal

    assert _required_literal("(?i)merge batch") is None
    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["please Merge Batch seven", "merge batch now",
                 "MERGE BATCH", "nothing relevant"],
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(2)
    idx = TrigramIndex(str(tmp_path / "tri-ci"), n_shards=4).build(ds)
    got = idx.search_regex(ds, "(?i)merge batch").to_pandas()
    assert sorted(got["doc_id"]) == [0, 1, 2]
    # scoped-group flags stay prunable and stay correct
    got2 = idx.search_regex(ds, "(?i:merge) batch").to_pandas()
    assert sorted(got2["doc_id"]) == [1]


def test_candidates_rarest_pruning(ray_session, tmp_path):
    """Hot-trigram pruning: only the max_tris rarest posting lists are
    read; results stay a superset and exact search parity holds."""
    import ray.data as rd

    rng = np.random.default_rng(3)
    # every doc carries the stopword-class filler; two carry the needle
    filler = "the and the for the with the "
    texts = [filler + " ".join(rng.choice(["aa", "bb", "cc"], 5))
             for _ in range(300)]
    texts[17] += " the xylophone quartet"
    texts[203] += " the xylophone quartet"
    df = pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64),
                       "text": texts})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(3)
    idx = TrigramIndex(str(tmp_path / "tri-hot"), n_shards=4).build(ds)
    needle = "the xylophone quartet"  # hot head, rare tail
    c_all = idx.candidates(needle, max_tris=10**9)
    c_pruned = idx.candidates(needle, max_tris=4)
    assert set(c_all.tolist()) <= set(c_pruned.tolist())  # superset
    assert {17, 203} <= set(c_pruned.tolist())
    got = idx.search(ds, "xylophone quartet").to_pandas()
    assert sorted(got["doc_id"]) == [17, 203]
    # a corpus-absent trigram short-circuits to zero candidates
    assert idx.candidates("zzzqqqvvv").size == 0


def test_hot_cap_bounds_driver(ray_session, tmp_path):
    """hot_cap: posting lists above the cap are never read. Partially
    hot needles stay pruned (superset via the cool lists only);
    all-hot needles return None → distributed full-verify scan, and
    search stays exact either way."""
    import ray.data as rd

    rng = np.random.default_rng(9)
    filler = "the and the for the with the "  # hot in every doc
    texts = [filler + " ".join(rng.choice(["aa", "bb", "cc"], 5))
             for _ in range(300)]
    texts[42] += " the xylophone quartet"
    texts[99] += " the xylophone quartet"
    df = pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64),
                       "text": texts})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(3)
    idx = TrigramIndex(str(tmp_path / "tri-cap"), n_shards=4).build(ds)

    # partially hot: cap excludes the ~300-count stopword lists but
    # keeps the 2-count rare ones — still a pruning superset
    c = idx.candidates("the xylophone quartet", hot_cap=10)
    assert c is not None and {42, 99} <= set(c.tolist())
    assert c.size < 300  # genuinely pruned, not a full-corpus list

    # all-hot: every trigram above the cap → None (full-scan signal)
    assert idx.candidates("the and the", hot_cap=1) is None

    # end-to-end exactness under both regimes
    got = idx.search(ds, "xylophone quartet", hot_cap=10).to_pandas()
    assert sorted(got["doc_id"]) == [42, 99]
    got2 = idx.search(ds, "the and the for", hot_cap=1).to_pandas()
    exp2 = df[df["text"].str.contains("the and the for", regex=False)]
    assert sorted(got2["doc_id"]) == sorted(exp2["doc_id"])
