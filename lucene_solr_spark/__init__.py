"""lucene_solr_spark — a PySpark-native inverted-index + BM25 engine.

A from-scratch rebuild of the indexing and search core of the reference
(`/root/reference`, Apache Lucene 9.0.0-SNAPSHOT) on idiomatic PySpark:

- analysis chain (StandardAnalyzer-equivalent) as vectorized Arrow UDFs
- inverted-index construction as DataFrame transforms + one salted
  repartition-by-term shuffle that packs 128-doc FOR/PFOR blocks
  (mirroring the Lucene84 postings format semantics, not its bytes)
- BM25 scoring (k1=1.2, b=0.75) as float32 numpy kernels reproducing
  `BM25Similarity.score` exactly (`weight - weight / (1 + freq * 1/norm)`)
- boolean AND/OR/NOT and block-max-pruned top-k over the postings tables

Everything is a DataFrame; storage is Parquet (Iceberg jars are not in
this image — `index.catalog` keeps snapshot manifests for lineage and
resume instead).
"""

__version__ = "0.1.0"
