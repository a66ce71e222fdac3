"""Content-keyed cache for derived test/fixture exports.

The JSON-collection and ORC exports materialize a derived copy of a
source table once per namespace (driver correctness runs re-read them
hundreds of times). The cache key covers the source's CONTENT identity
(path + mtime + size), not just its path: regenerating the fixtures at
the same sf_dir must invalidate the export, otherwise a stale derived
copy silently diverges from the parquet the oracle reads (review
finding on the earlier path-only md5 key).
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from collections.abc import Callable


def dataset_fingerprint(path: str) -> str:
    """Stable hex digest of a file's (or dataset directory's) identity:
    absolute path plus every member file's (name, mtime_ns, size).
    Metadata-only — never reads data bytes."""
    h = hashlib.md5(os.path.abspath(path).encode())
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            st = os.stat(os.path.join(path, name))
            h.update(f"{name}:{st.st_mtime_ns}:{st.st_size}".encode())
    elif os.path.exists(path):
        st = os.stat(path)
        h.update(f"{st.st_mtime_ns}:{st.st_size}".encode())
    return h.hexdigest()[:16]


def cached_export(
    prefix: str, source_path: str, build: Callable[[str], None]
) -> str:
    """Return the path of a derived export of `source_path`, building it
    with `build(out_dir)` only when no complete (_SUCCESS-marked) export
    exists for the source's current content fingerprint."""
    key = dataset_fingerprint(source_path)
    out = os.path.join(tempfile.gettempdir(), f"{prefix}_{key}")
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        build(out)
    return out
