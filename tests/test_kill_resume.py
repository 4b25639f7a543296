"""True kill-mid-run resume test (FIXTURES §3: 'kill mid-run, re-run
with same run_id, assert estimates equal the uninterrupted run and each
partition's lineage record appears exactly once')."""

import json
import os
import signal
import subprocess
import sys
import time

from presto_bloomfilter_ray.engine import SketchStore

_CHILD = """
import ray, sys
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from presto_bloomfilter_ray.pipelines import run_suite
run_suite(sys.argv[1], store_root=sys.argv[2], run_id="kill", n_hint=20000)
print("DONE")
"""


def test_kill_mid_run_then_resume(ray_session, tmp_path):
    from presto_bloomfilter_ray.pipelines import run_suite
    from presto_bloomfilter_ray.sources import ensure_webpages

    web_dir = ensure_webpages(20_000)
    store_root = str(tmp_path / "kill-store")

    # start the suite in a subprocess and SIGKILL it mid-flight
    proc = subprocess.Popen(
        [sys.executable, "-c", _CHILD, web_dir, store_root],
        cwd="/root/repo", stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
    )
    store = SketchStore(store_root)
    deadline = time.time() + 60
    while time.time() < deadline:
        done = [k for k in store.keys("checkpoints/kill/suite") if k.endswith(".done")]
        if len(done) >= 3:  # some partitions committed, most still pending
            break
        if proc.poll() is not None:
            break  # finished before we could kill — resume still exercised
        time.sleep(0.1)
    if proc.poll() is None:
        proc.send_signal(signal.SIGKILL)
        proc.wait()
    # the child's ray workers can straggle a moment past the driver's
    # death; give their in-flight checkpoint commits a grace period
    time.sleep(3)

    partial_done = len(
        [k for k in store.keys("checkpoints/kill/suite") if k.endswith(".done")]
    )

    # resume in-process with the SAME run_id → completes; every partition
    # the child committed is skipped, not recomputed
    res = run_suite(web_dir, store_root=store_root, run_id="kill", n_hint=20_000)
    assert res["summary"]["rows"] == 20_000
    assert res["summary"]["resumed_partitions"] == partial_done
    # exactly-once proof: KLL carries an exact item count — double-counted
    # partitions would inflate it past the row count
    assert res["sketches"]["kll_textlen"].n == 20_000

    # reference run (fresh store) must produce IDENTICAL estimates
    ref = run_suite(web_dir, store_root=str(tmp_path / "ref-store"),
                    run_id="ref", n_hint=20_000)
    assert res["summary"]["distinct_urls_hll"] == ref["summary"]["distinct_urls_hll"]
    assert res["summary"]["distinct_hosts_hll"] == ref["summary"]["distinct_hosts_hll"]
    assert res["summary"]["rows"] == ref["summary"]["rows"]

    # lineage: exactly one record per partition
    lineage_keys = store.keys("lineage/kill/suite")
    parts = [json.loads(store.get(k).decode())["partition"] for k in lineage_keys]
    assert len(parts) == len(set(parts)) == res["summary"]["partitions"]
