"""``ray job submit``-compatible pipeline entrypoints.

On a real cluster:

.. code-block:: bash

    ray job submit --working-dir . -- \
        python -m presto_bloomfilter_ray.cli suite \
        --input s3://bucket/webpages --store /mnt/shared/sketch-store \
        --run-id prod-2026-08-17

Locally the same command works against local paths. The script guards
``ray.init`` (connects to the job's cluster when already initialized;
starts a local session otherwise) and always ``ray.shutdown``s on exit
so the next run starts clean.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    return ray


def cmd_suite(args) -> int:
    from .pipelines import run_suite

    res = run_suite(args.input, store_root=args.store, run_id=args.run_id,
                    n_hint=args.n_hint, max_shards=args.max_shards)
    print(json.dumps(res["summary"]))
    return 0


def cmd_gen(args) -> int:
    from .sources import ensure_webpages

    path = ensure_webpages(args.rows, root=args.out, num_files=args.files)
    print(json.dumps({"path": path, "rows": args.rows}))
    return 0


def cmd_dedup(args) -> int:
    import ray.data as rd

    from .functions import exact_dedup, minhash_dedup

    ds = rd.read_parquet(args.input)
    if args.method == "exact":
        out = exact_dedup(ds, col=args.text_col, id_col=args.id_col)
        removed = None
    else:
        out, dup_map = minhash_dedup(ds, threshold=args.threshold,
                                     text_col=args.text_col, id_col=args.id_col)
        removed = len({k for k, v in dup_map.items() if k != v})
    out.write_parquet(args.output)
    print(json.dumps({"kept": out.count(), "removed": removed,
                      "output": args.output}))
    return 0


def cmd_decontaminate(args) -> int:
    import ray.data as rd

    from .functions import decontaminate

    corpus = rd.read_parquet(args.input)
    bench = rd.read_parquet(args.benchmark)
    n_in = corpus.count()
    out = decontaminate(corpus, bench, text_col=args.text_col,
                        expected_insertions=args.expected_insertions,
                        fpp=args.fpp, unit=args.unit, ngram=args.ngram)
    out.write_parquet(args.output)
    n_out = rd.read_parquet(args.output).count()
    print(json.dumps({"input_docs": n_in, "kept": n_out,
                      "removed": n_in - n_out, "unit": args.unit,
                      "output": args.output}))
    return 0


def cmd_diff(args) -> int:
    """Reconcile two parquet snapshots by key at O(diff) memory (IBLT):
    writes rows unique to each side, never shuffles either input."""
    import ray.data as rd

    from .functions import dataset_diff

    a = rd.read_parquet(args.a)
    b = rd.read_parquet(args.b)
    only_a, only_b = dataset_diff(a, b, args.key, cells=args.cells)
    only_a.write_parquet(f"{args.output}/only_a")
    only_b.write_parquet(f"{args.output}/only_b")
    na = rd.read_parquet(f"{args.output}/only_a").count()
    nb = rd.read_parquet(f"{args.output}/only_b").count()
    print(json.dumps({"only_a": na, "only_b": nb, "output": args.output}))
    return 0


def cmd_grep(args) -> int:
    """Substring-search a documents table through the trigram posting
    index: builds the index at --index if absent (or --rebuild), then
    prints matching ids — reads only the needle's posting shards plus
    candidate docs, never full-scans the corpus."""
    import os

    import ray.data as rd

    from .functions import TrigramIndex

    idx = TrigramIndex(args.index, n_shards=args.shards)
    docs = rd.read_parquet(args.input, columns=[args.id_col,
                                                args.text_col])
    if args.rebuild or not os.path.exists(
            os.path.join(args.index, "manifest.json")):
        idx.build(docs, text_col=args.text_col, id_col=args.id_col)
        docs = rd.read_parquet(args.input, columns=[args.id_col,
                                                    args.text_col])
    fn = idx.search_regex if args.regex else idx.search
    hits = fn(docs, args.needle, text_col=args.text_col,
              id_col=args.id_col).to_pandas()
    ids = sorted(int(x) for x in hits[args.id_col]) if len(hits) else []
    print(json.dumps({"needle": args.needle, "n_hits": len(ids),
                      "ids": ids[: args.limit]}))
    return 0


def cmd_serve(args) -> int:
    """Serve a sketch store over the reference persist-service wire
    protocol (PUT/GET /bloomfilter/<key>) for non-engine clients."""
    from .engine.http_service import SketchHTTPService
    from .engine.store import open_store

    svc = SketchHTTPService(open_store(args.store), host=args.host,
                            port=args.port).start()
    print(json.dumps({"url": svc.url, "store": args.store}), flush=True)
    try:
        import time

        while True:  # serve until interrupted
            time.sleep(3600)
    except KeyboardInterrupt:
        return 0
    finally:
        svc.stop()


def cmd_stats(args) -> int:
    """Introspect a sketch store: keys, sizes, params, estimates."""
    from .engine.store import open_store
    from .sketches.base import read_kind, read_params

    store = open_store(args.store)
    out = []
    for key in store.keys(args.prefix):
        try:
            buf = store.get(key)
            rec = {"key": key, "bytes": len(buf), "kind": read_kind(buf),
                   "params": read_params(buf)}
            if args.estimates:
                sk = store.load(key)
                if hasattr(sk, "estimate"):
                    try:
                        rec["estimate"] = round(float(sk.estimate()), 2)
                    except TypeError:
                        pass
            out.append(rec)
        except Exception:
            out.append({"key": key, "bytes": None, "kind": None})
    print(json.dumps(out))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="presto_bloomfilter_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("suite", help="flagship sketch suite (resumable)")
    s.add_argument("--input", required=True)
    s.add_argument("--store", default="/tmp/sketch-store")
    s.add_argument("--run-id", default="default")
    s.add_argument("--n-hint", type=int, default=1_000_000)
    s.add_argument("--max-shards", type=int, default=None)
    s.set_defaults(fn=cmd_suite)

    g = sub.add_parser("gen", help="generate the deterministic webpages table")
    g.add_argument("--rows", type=int, required=True)
    g.add_argument("--out", default="/tmp/webpages")
    g.add_argument("--files", type=int, default=96)
    g.set_defaults(fn=cmd_gen)

    d = sub.add_parser("dedup", help="deduplicate a documents table")
    d.add_argument("--input", required=True)
    d.add_argument("--output", required=True)
    d.add_argument("--method", choices=["exact", "minhash"], default="exact")
    d.add_argument("--threshold", type=float, default=0.8)
    d.add_argument("--text-col", default="text")
    d.add_argument("--id-col", default="doc_id")
    d.set_defaults(fn=cmd_dedup)

    c = sub.add_parser("decontaminate", help="drop corpus docs sharing "
                       "lines / token n-grams with a benchmark table")
    c.add_argument("--input", required=True)
    c.add_argument("--benchmark", required=True,
                   help="parquet of held-out eval docs (the small side)")
    c.add_argument("--output", required=True)
    c.add_argument("--text-col", default="text")
    c.add_argument("--unit", choices=["line", "ngram"], default="ngram")
    c.add_argument("--ngram", type=int, default=13)
    c.add_argument("--expected-insertions", type=int, default=1_000_000)
    c.add_argument("--fpp", type=float, default=1e-4)
    c.set_defaults(fn=cmd_decontaminate)

    f = sub.add_parser("diff", help="reconcile two parquet snapshots "
                       "by key at O(diff) memory (IBLT)")
    f.add_argument("--a", required=True, help="snapshot A parquet path")
    f.add_argument("--b", required=True, help="snapshot B parquet path")
    f.add_argument("--key", required=True, help="unique key column")
    f.add_argument("--cells", type=int, default=1 << 16,
                   help="IBLT cells; must exceed ~1.4x the expected diff")
    f.add_argument("--output", required=True)
    f.set_defaults(fn=cmd_diff)

    q = sub.add_parser("grep", help="substring-search documents via "
                       "the trigram posting index")
    q.add_argument("--input", required=True, help="documents parquet")
    q.add_argument("--index", required=True, help="index directory")
    q.add_argument("--needle", required=True)
    q.add_argument("--text-col", default="text")
    q.add_argument("--id-col", default="doc_id")
    q.add_argument("--shards", type=int, default=64)
    q.add_argument("--rebuild", action="store_true")
    q.add_argument("--regex", action="store_true",
                   help="treat the needle as an RE2 regex "
                        "(literal-pruned through the same postings)")
    q.add_argument("--limit", type=int, default=100,
                   help="max ids printed")
    q.set_defaults(fn=cmd_grep)

    t = sub.add_parser("stats", help="introspect a sketch store")
    t.add_argument("--store", required=True)
    t.add_argument("--prefix", default="")
    t.add_argument("--estimates", action="store_true")
    t.set_defaults(fn=cmd_stats, needs_ray=False)

    v = sub.add_parser("serve", help="serve a sketch store over HTTP "
                       "(reference persist-service wire protocol)")
    v.add_argument("--store", required=True)
    v.add_argument("--host", default="127.0.0.1")
    v.add_argument("--port", type=int, default=8123)
    v.set_defaults(fn=cmd_serve, needs_ray=False)

    args = p.parse_args(argv)
    if getattr(args, "needs_ray", True):
        ray = _ensure_ray()
        try:
            return args.fn(args)
        finally:
            ray.shutdown()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
