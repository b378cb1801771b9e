"""Driver-side parquet I/O for KB-scale index metadata.

The persisted-index layouts (``operators/pq.py:write_pq_index``,
``operators/dedup.py:write_minhash_index``) keep their model/meta as ONE
parquet row next to the data-sized codes/index directories.  That row is
kilobyte-scale metadata the driver already holds in memory — yet writing
it as ``spark.createDataFrame([row]).write.parquet`` costs a full Spark
job round-trip (scheduler → task launch → commit protocol → rename), and
reading it back costs another, just to move a few KB to/from the driver.
At 100 TB the cost is the same two pointless cluster jobs; locally it is
~0.5 s of fixed overhead per round-trip on every fit-and-serve query.

These helpers write/read such rows with pyarrow directly when the path
is driver-local, producing a STANDARD parquet file under the same
directory layout — Spark reads it unchanged and doubles round-trip
bit-exactly (both pinned in tests/test_pq.py) — and report "not
handled" for non-local URIs so the caller falls back to the Spark job
path (on a cluster the index usually lives on s3/hdfs, where the
executor-side write is the right tool).

Only metadata rows belong here: anything data-sized must stay a normal
distributed write (the codes/index parquet jobs are untouched).
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import urlparse

__all__ = ["local_fs_path", "write_meta_rows", "read_meta_rows"]


def local_fs_path(path: str) -> str | None:
    """Return the bare filesystem path when ``path`` is driver-local
    (no scheme, or an explicit ``file:`` URI); None otherwise."""
    parsed = urlparse(path)
    if parsed.scheme in ("", "file"):
        return parsed.path if parsed.scheme else path
    return None


def write_meta_rows(path: str, table, *, mode: str = "overwrite") -> bool:
    """Write a (tiny) ``pyarrow.Table`` as ``{path}/part-00000.parquet``.

    Returns False — caller must fall back to the Spark write — when the
    path is not driver-local or ``mode`` is not one of
    overwrite/error/errorifexists.  Overwrite removes the directory first
    (same contract as Spark's overwrite save mode); error modes raise if
    the directory already exists.
    """
    import pyarrow.parquet as pq

    local = local_fs_path(path)
    if local is None:
        return False
    if mode == "overwrite":
        if os.path.exists(local):
            shutil.rmtree(local)
    elif mode in ("error", "errorifexists"):
        if os.path.exists(local):
            raise FileExistsError(f"path already exists: {path}")
    else:  # append/ignore keep Spark's exact semantics — not re-implemented
        return False
    os.makedirs(local, exist_ok=True)
    pq.write_table(table, os.path.join(local, "part-00000.parquet"))
    return True


def read_meta_rows(path: str, schema=None) -> list[dict] | None:
    """Read every row of a (tiny) metadata directory as ``list[dict]``,
    casting to ``schema`` (a ``pyarrow.Schema``) when given so the values
    come back with the exact types the writer declared regardless of
    which engine wrote the files.  Returns None — caller must fall back
    to the Spark read — when the path is not driver-local.

    Reads any parquet files in the directory (pyarrow- OR Spark-written;
    ``_SUCCESS``/CRC markers ignored), so the two write paths
    interoperate freely.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    local = local_fs_path(path)
    if local is None:
        return None
    files = sorted(
        os.path.join(local, f)
        for f in os.listdir(local)
        if f.endswith(".parquet")
    )
    if not files:
        raise ValueError(f"no parquet files at {path}")
    tables = [pq.read_table(f) for f in files]
    table = pa.concat_tables(tables) if len(tables) > 1 else tables[0]
    if schema is not None:
        table = table.cast(schema)
    return table.to_pylist()
