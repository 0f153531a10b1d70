"""Object-store control plane (SURVEY.md §2.A7, §2.B7).

The reference ships a boto3 S3 hook: key listing/globbing, existence
checks, reads, uploads, batched deletes (≤1000 keys/call) and copies
(reference: martech_pipelines/hooks/aws_s3.py). In the engine, *data-path*
S3 access is Hadoop S3A through ``spark.read`` — distributed, no hook. The
control-plane operations (driver-side listing, marker files, cleanup) keep
the hook API shape here, backed by ``fsspec``-style local/posix paths so
the same code tests locally and swaps to ``s3fs`` on AWS.

URI convention: ``store://bucket/key`` parses like the reference's
``s3://``; plain paths are treated as (root, relative-key).
"""

from __future__ import annotations

import fnmatch
import glob as _glob
import gzip
import os
import shutil
from collections.abc import Iterable

from martech_pipelines_spark.operators.sinks import chunkify

DELETE_BATCH_MAX = 1000  # AWS delete_objects cap the reference honors
                         # (reference: martech_pipelines/hooks/aws_s3.py:304-310)


def parse_uri(uri: str) -> tuple[str, str]:
    """Split ``scheme://bucket/key`` -> (bucket_root, key); plain paths
    split at the last '/' (reference: martech_pipelines/hooks/aws_s3.py:25-41)."""
    if "://" in uri:
        rest = uri.split("://", 1)[1]
        bucket, _, key = rest.partition("/")
        return bucket, key
    head, _, tail = uri.rpartition("/")
    return head, tail


class LocalObjectStore:
    """Filesystem-backed object store with the reference hook's surface."""

    def __init__(self, root: str) -> None:
        self.root = root

    def _abs(self, key: str) -> str:
        return os.path.join(self.root, key)

    # --- listing (A7) --------------------------------------------------------

    def list_keys(self, prefix: str = "", pattern: str | None = None) -> list[str]:
        """Recursive key listing under a prefix, optional glob filter."""
        base = self._abs(prefix)
        out = []
        for path in _glob.glob(os.path.join(base, "**"), recursive=True):
            if os.path.isfile(path):
                key = os.path.relpath(path, self.root)
                if pattern is None or fnmatch.fnmatch(key, pattern):
                    out.append(key)
        return sorted(out)

    def list_prefixes(self, prefix: str = "") -> list[str]:
        """Immediate 'subdirectories' under a prefix."""
        base = self._abs(prefix)
        if not os.path.isdir(base):
            return []
        return sorted(
            f"{prefix.rstrip('/')}/{d}".lstrip("/")
            for d in os.listdir(base)
            if os.path.isdir(os.path.join(base, d))
        )

    def check_for_key(self, key: str) -> bool:
        return os.path.isfile(self._abs(key))

    def read_key(self, key: str) -> bytes:
        with open(self._abs(key), "rb") as fh:
            return fh.read()

    # --- writes (B2/B3) ------------------------------------------------------

    def upload_bytes(self, key: str, data: bytes, gzip_compress: bool = False) -> None:
        """Byte upload; optional gzip (reference: hooks/aws_s3.py:236-249)."""
        path = self._abs(key)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        if gzip_compress:
            with gzip.open(path, "wb") as fh:
                fh.write(data)
        else:
            with open(path, "wb") as fh:
                fh.write(data)

    # --- control-plane mutations (B7) ---------------------------------------

    def delete_keys(self, keys: Iterable[str]) -> int:
        """Batched delete honoring the 1000-key cap per 'call'; returns the
        number deleted. Missing keys are skipped (S3 delete semantics)."""
        n = 0
        for batch in chunkify(list(keys), DELETE_BATCH_MAX):
            for key in batch:
                path = self._abs(key)
                if os.path.isfile(path):
                    os.remove(path)
                    n += 1
        return n

    def copy_key(self, src_key: str, dst_key: str) -> None:
        dst = self._abs(dst_key)
        os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
        shutil.copyfile(self._abs(src_key), dst)
