"""PySpark-native full-text code-search engine.

A from-scratch rebuild of the capabilities of
spyoungtech/gitlab-elasticsearch-indexer (reference at /root/reference,
Go + Elasticsearch) as an idiomatic PySpark engine:

* the document pipeline (reference ``indexer/`` package) becomes native
  DataFrame transformations over a columnar source table
  ``(repo, path, commit, lang, content)``;
* the index + query engine the reference delegates to Elasticsearch
  (analyzer chain, inverted index, BM25, top-k) is built natively:
  vectorized Arrow tokenizer kernels, partitioned posting-list tables
  with delta+varint compression, BM25 scoring and block-max WAND top-k.

All per-row logic is Arrow-vectorized (pandas UDF / mapInPandas); no
row-at-a-time Python UDFs anywhere.
"""

__version__ = "0.1.0"
