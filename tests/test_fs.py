"""The store's filesystem seam (sources/fs.py).

Driver-side control paths (manifest probes, vacuum, point reads) route
through pyarrow.fs so the same code serves local disk and object
storage.  These tests exercise the LocalFileSystem branch directly and
the from_uri dispatch via file:// URIs.
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gitlab_elasticsearch_indexer_spark.sources import fs


@pytest.fixture()
def tree(tmp_path):
    (tmp_path / "idx" / "v1" / "postings").mkdir(parents=True)
    (tmp_path / "idx" / "v1" / "postings" / "part-0.parquet").write_bytes(
        b"x" * 10
    )
    (tmp_path / "idx" / "v1" / "manifest").mkdir()
    (tmp_path / "idx" / "v1" / "manifest" / "m.parquet").write_bytes(b"y" * 3)
    return tmp_path / "idx"


def test_resolve_local_and_uri(tree):
    from pyarrow.fs import LocalFileSystem

    f, p = fs.resolve(str(tree))
    assert isinstance(f, LocalFileSystem) and p == str(tree)
    f2, p2 = fs.resolve(f"file://{tree}")
    assert isinstance(f2, LocalFileSystem) and p2 == str(tree)


def test_isdir_listdir(tree):
    assert fs.isdir(str(tree / "v1"))
    assert not fs.isdir(str(tree / "v1" / "postings" / "part-0.parquet"))
    assert not fs.isdir(str(tree / "nope"))
    assert sorted(fs.listdir(str(tree / "v1"))) == ["manifest", "postings"]
    assert fs.listdir(str(tree / "nope")) == []
    # listdir of a file is [] (not an error) — vacuum probes rely on it
    assert fs.listdir(str(tree / "v1" / "manifest" / "m.parquet")) == []


def test_tree_size_and_rmtree(tree):
    assert fs.tree_size(str(tree / "v1")) == 13
    assert fs.tree_size(str(tree / "nope")) == 0
    fs.rmtree(str(tree / "v1" / "postings"))
    assert not fs.isdir(str(tree / "v1" / "postings"))
    assert fs.tree_size(str(tree / "v1")) == 3
    fs.rmtree(str(tree / "nope"))  # ignore-missing, no raise


def test_dataset_reads_parquet(tmp_path):
    pq.write_table(
        pa.table({"doc_idx": [1, 2, 3], "id": ["a", "b", "c"]}),
        tmp_path / "t.parquet",
    )
    import pyarrow.dataset as pads

    tbl = fs.dataset(str(tmp_path)).to_table(
        columns=["id"], filter=pads.field("doc_idx") >= 2
    )
    assert sorted(tbl["id"].to_pylist()) == ["b", "c"]
