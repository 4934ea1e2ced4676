"""solr_indexing_spark — a PySpark-native full-text indexing + BM25 retrieval engine.

Re-expresses the document-preparation dataflow of the reference
(vd02/solr-indexing: ``solrIndexCreation.ts``/``common.ts``/``indexDocument.ts``)
as idiomatic Spark DataFrame operators, and builds from scratch the index/query
half the reference delegates to Solr/Elasticsearch (commented-out
``BulkIndexing`` calls, ``solrIndexCreation.ts:876-882``): tokenization,
term-partitioned posting-list construction, delta+VByte block compression with
skip pointers and block-max caps, hierarchical resumable segment merge, and a
BM25 (k1=1.2, b=0.75) block-max WAND top-k scorer.

Everything here derives from public knowledge only: the Apache Spark / PySpark
API, the reference repo's observable behavior, and the published BM25 /
Block-Max-WAND literature (Robertson & Zaragoza 2009; Ding & Suel, SIGIR 2011).
"""

__version__ = "0.1.0"

K1 = 1.2
B = 0.75
BLOCK_SIZE = 128

# Above this many dead (tombstoned) ids, query + merge switch from a
# closure-shipped frozenset/array to a torrent broadcast — one copy per
# executor instead of per task closure. Shared so the two paths flip at
# the same churn level.
TOMBSTONE_BROADCAST_THRESHOLD = 1_000_000
