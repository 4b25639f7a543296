"""SketchStore — persist/load + per-partition checkpoints.

Replaces the reference's HTTP persist-service (``persist-service/server.go:30-57``,
boltdb file backend ``file_backend.go:15-79``, pluggable backend
interface ``ibackend.go:10-29``) with a filesystem-backed KV: keys are
relative paths, values are envelope bytes, writes are atomic on local
filesystems (tmp + rename — the same guarantee boltdb transactions gave
the reference; on object stores a single PUT is already atomic).

Backend pluggability mirrors the reference's ``ibackend.go`` dispatch:
the store speaks ``pyarrow.fs.FileSystem``, so ``/local/path``,
``s3://bucket/prefix`` etc. all work — pass a URI or an explicit
``filesystem=``. The same store doubles as the checkpoint layer the
north_rule requires: partial sketches live under deterministic
``run_id/stage/partition`` keys so a re-run skips completed partitions
(SURVEY §3.3).
"""

from __future__ import annotations

import posixpath
import uuid
from typing import List, Optional

import pyarrow.fs as pafs

from ..sketches.base import Sketch, deserialize


class SketchStore:
    def __init__(self, root: str, filesystem: Optional[pafs.FileSystem] = None):
        if filesystem is not None:
            self.fs = filesystem
            self.root = root.rstrip("/")
        elif "://" in root:
            self.fs, path = pafs.FileSystem.from_uri(root)
            self.root = path.rstrip("/")
        else:
            import os

            self.fs = pafs.LocalFileSystem()
            self.root = os.path.abspath(root)
        self.fs.create_dir(self.root, recursive=True)

    def _path(self, key: str) -> str:
        p = posixpath.normpath(posixpath.join(self.root, key))
        if not p.startswith(self.root + "/") and p != self.root:
            raise ValueError(f"key escapes store root: {key}")
        return p

    def put(self, key: str, value: bytes) -> bool:
        """Atomic write (reference ``bloom_filter_persist`` → HTTP PUT,
        ``BloomFilterPersistScalarFunction.java:38-63``; a null key is
        a no-op returning True, matching the null-URL semantics)."""
        if key is None:
            return True
        path = self._path(key)
        parent = posixpath.dirname(path)
        self.fs.create_dir(parent, recursive=True)
        tmp = f"{parent}/.tmp-{uuid.uuid4().hex[:12]}"
        try:
            with self.fs.open_output_stream(tmp) as f:
                f.write(value)
            self.fs.move(tmp, path)  # rename on local fs → atomic commit
        except BaseException:
            try:
                self.fs.delete_file(tmp)
            except OSError:
                pass
            raise
        return True

    def get(self, key: str) -> bytes:
        """Reference ``bloom_filter_load`` fetch path (``BloomFilter.java:116-138``)."""
        with self.fs.open_input_stream(self._path(key)) as f:
            return f.read()

    def exists(self, key: str) -> bool:
        return self.fs.get_file_info(self._path(key)).type == pafs.FileType.File

    def delete(self, key: str) -> None:
        try:
            self.fs.delete_file(self._path(key))
        except (FileNotFoundError, OSError):
            pass

    def keys(self, prefix: str = "") -> List[str]:
        base = self._path(prefix) if prefix else self.root
        sel = pafs.FileSelector(base, recursive=True, allow_not_found=True)
        out: List[str] = []
        for info in self.fs.get_file_info(sel):
            if info.type != pafs.FileType.File:
                continue
            name = info.path.rsplit("/", 1)[-1]
            if name.startswith(".tmp-"):
                continue
            out.append(posixpath.relpath(info.path, self.root))
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

    # checkpoint key layout lives with the pipeline that owns it
    # (``pipelines/flagship.py``: content-hashed shard keys + .done
    # commit markers under checkpoints/<run_id>/<stage>/)
