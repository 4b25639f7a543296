"""SketchStore — persist/load + per-partition checkpoints.

Replaces the reference's HTTP persist-service (``persist-service/server.go:30-57``,
boltdb file backend ``file_backend.go:15-79``, pluggable backend
interface ``ibackend.go:10-29``) with a directory-backed KV: keys are
relative paths, values are envelope bytes, writes are atomic
(tmp + rename — same guarantee boltdb transactions gave the reference).
The same store doubles as the checkpoint layer the north_rule requires:
partial sketches live under deterministic ``run_id/stage/partition``
keys so a re-run skips completed partitions (SURVEY §3.3).
"""

from __future__ import annotations

import os
import tempfile
from typing import List, Optional

from ..sketches.base import Sketch, deserialize


class SketchStore:
    def __init__(self, root: str):
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)

    def _path(self, key: str) -> str:
        p = os.path.abspath(os.path.join(self.root, key))
        if not p.startswith(self.root + os.sep) and p != self.root:
            raise ValueError(f"key escapes store root: {key}")
        return p

    def put(self, key: str, value: bytes) -> bool:
        """Atomic write (reference ``bloom_filter_persist`` → HTTP PUT,
        ``BloomFilterPersistScalarFunction.java:38-63``; a null key is
        a no-op returning True, matching the null-URL semantics)."""
        if key is None:
            return True
        path = self._path(key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), prefix=".tmp-")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(value)
            os.replace(tmp, path)
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise
        return True

    def get(self, key: str) -> bytes:
        """Reference ``bloom_filter_load`` fetch path (``BloomFilter.java:116-138``)."""
        with open(self._path(key), "rb") as f:
            return f.read()

    def exists(self, key: str) -> bool:
        return os.path.isfile(self._path(key))

    def delete(self, key: str) -> None:
        try:
            os.unlink(self._path(key))
        except FileNotFoundError:
            pass

    def keys(self, prefix: str = "") -> List[str]:
        base = self._path(prefix) if prefix else self.root
        out: List[str] = []
        for dirpath, _dirs, files in os.walk(base):
            for fn in files:
                if fn.startswith(".tmp-"):
                    continue
                out.append(os.path.relpath(os.path.join(dirpath, fn), self.root))
        return sorted(out)

    # ---------------------------------------------------------- sketch sugar
    def persist(self, sketch: Sketch, key: str) -> bool:
        return self.put(key, sketch.serialize())

    def load(self, key: str) -> Sketch:
        return deserialize(self.get(key))

    def load_and_merge(self, keys) -> Optional[Sketch]:
        """Reference ``bloom_filter_load`` aggregation shape: load a
        sequence of persisted sketches and union them
        (``BloomFilterLoad.java:30-39``)."""
        acc: Optional[Sketch] = None
        for k in keys:
            sk = self.load(k)
            acc = sk if acc is None else acc.merge(sk)
        return acc

    # ---------------------------------------------------------- checkpoints
    @staticmethod
    def checkpoint_key(run_id: str, stage: str, partition: int) -> str:
        return f"checkpoints/{run_id}/{stage}/part-{partition:06d}"

    def completed_partitions(self, run_id: str, stage: str) -> List[int]:
        prefix = f"checkpoints/{run_id}/{stage}"
        out = []
        for k in self.keys(prefix):
            base = os.path.basename(k)
            if base.startswith("part-"):
                out.append(int(base.split("-")[1]))
        return sorted(out)
