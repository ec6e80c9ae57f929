"""lab_1806_vec_db_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the `lab-1806-vec-db` vector database
(reference: pku-lab-1806-llm/lab-1806-vec-db), re-expressed Spark-first.

The reference is a single-node Rust vector database: multi-table store of
dense f32/u8 embedding vectors with per-row string metadata, kNN search
under L2²/cosine distance, Flat/IVF/HNSW indexes, and product quantization.
This package maps that capability surface onto the Spark execution model:

- tables are DataFrames ``(id LONG, vec ARRAY<FLOAT>, metadata MAP<STRING,
  STRING>, norm DOUBLE)`` persisted as Parquet (reference:
  src/database/metadata_vec_table.rs:14-20);
- kNN is a declarative plan — distance projection + ``ORDER BY .. LIMIT k``
  (Catalyst ``TakeOrderedAndProject``) — not a hand-written scan loop
  (reference: src/index_algorithm/flat_index.rs:48-57);
- IVF is a *partition layout* (data partitioned by cluster id) so that
  probe pruning is Spark partition pruning (src/index_algorithm/
  ivf_index.rs:132-155);
- PQ is a codes DataFrame + Arrow-vectorized ADC scan (src/distance/
  pq_table.rs);
- HNSW is a broadcast compact graph traversed per-query inside
  ``mapInPandas`` over the *queries* DataFrame — queries, not base data,
  are the parallel axis (the reference parallelizes the same way:
  examples/bench.rs:414-417).

Beyond reference parity, the package ships the LLM-data-pipeline operators
a 100 TB training-data pipeline needs:

- ``operators/dedup.py`` — exact hash dedup, MinHash + banded LSH,
  SimHash, n-gram Jaccard verify, embedding cosine near-dup (exact and
  random-hyperplane-bucketed);
- ``functions/text.py`` — tokenization, token/char statistics, stopword
  ratio, language-ID heuristic, quality scoring, rolling fingerprints;
- ``multimodal/binary_ops.py`` — opaque-binary media columns with
  Arrow-batched decode/featurize/frame-sample plumbing (codec kernels
  stubbed: no image/audio libraries in this environment);
- ``sources/binary.py`` — fvecs / raw-bin (f32 & u8) readers, TOML
  config dispatch, one-time Parquet converters;
- ``streaming/windows.py`` — tumbling event-time rollups (batch/stream
  dual-mode) and sessionization.
"""

from lab_1806_vec_db_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
