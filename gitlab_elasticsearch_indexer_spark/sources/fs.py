"""Tiny filesystem layer for the versioned index store's driver-side
control paths (manifest probes, vacuum, point reads).

Every call site that previously used ``os.path`` / ``glob`` / ``shutil``
on driver-visible paths routes through here instead, backed by
``pyarrow.fs`` — so the same code runs against a local directory, an
NFS mount, or object storage (``s3://…``, ``hdfs://…``, ``gs://…`` via
``pyarrow.fs.FileSystem.from_uri``).  The hot data path is unaffected:
Spark reads/writes the store through its own Hadoop FS layer; these
helpers only serve bounded, driver-side metadata and point-read
operations (O(parts touched), never a scan).

The reference talks to its store through the ES REST client
(elastic/client.go) and needs no filesystem; this layer is the analog
seam for our parquet-backed store.
"""

from __future__ import annotations

from pyarrow import fs as pafs


def resolve(path: str) -> tuple[pafs.FileSystem, str]:
    """Path or URI → (pyarrow FileSystem, fs-relative path).

    Plain paths (no scheme) map to ``LocalFileSystem`` — the branch
    every test exercises; URIs dispatch through ``from_uri`` (s3, gs,
    hdfs, file, …).
    """
    s = str(path)
    if "://" in s:
        f, p = pafs.FileSystem.from_uri(s)
        return f, p
    return pafs.LocalFileSystem(), s


def isdir(path: str) -> bool:
    f, p = resolve(path)
    return f.get_file_info(p).type == pafs.FileType.Directory


def listdir(path: str) -> list[str]:
    """Base names of a directory's children; [] when absent."""
    f, p = resolve(path)
    if f.get_file_info(p).type != pafs.FileType.Directory:
        return []
    return [
        i.base_name
        for i in f.get_file_info(pafs.FileSelector(p))
    ]


def rmtree(path: str) -> None:
    """Recursive delete, ignore-missing (shutil.rmtree ignore_errors)."""
    f, p = resolve(path)
    try:
        f.delete_dir(p)
    except (FileNotFoundError, OSError):
        pass


def tree_size(path: str) -> int:
    """Total bytes of all files under ``path`` (0 when absent)."""
    f, p = resolve(path)
    try:
        infos = f.get_file_info(pafs.FileSelector(p, recursive=True))
    except (FileNotFoundError, OSError):
        return 0
    return sum(
        (i.size or 0) for i in infos if i.type == pafs.FileType.File
    )


def dataset(path: str, **kwargs):
    """Parquet ``pyarrow.dataset`` bound to the path's filesystem."""
    import pyarrow.dataset as pads

    f, p = resolve(path)
    return pads.dataset(p, filesystem=f, format="parquet", **kwargs)
