"""spark-optics: a PySpark-native engine with the query and data-processing
capabilities of auslan-find-sign/pigeon-optics, rebuilt Spark-first.

Package layout (mirrors SURVEY.md §7):

- ``values``    — M0 canonical dynamic-value core: tagged JSON form, canonical
                  bytes, ``object_hash`` (sha256), attachment-link extraction,
                  cid: rewriting.  (ref: library/models/codec/object-hash.js,
                  library/utility/record-structure.js)
- ``paths``     — data-path encode/decode (``/{source}/{author}:{name}[/records/{id}]``).
                  (ref: library/models/codec/path.js)
- ``session``   — SparkSession factory tuned for the driver's local[32] box but
                  configured the way a 1000-executor cluster job would be (AQE,
                  UTC, Arrow, shuffle partitions).
- ``store``     — M1 versioned multi-author dataset store on Parquet
                  (Delta MERGE on a real cluster).  (ref: library/models/
                  base-data-model.js, dataset.js)
- ``reduce``    — the reference's type-directed deep-merge reduce.
                  (ref: library/utility/reduce.js)
- ``lens``      — M2 lens engine: user map code via mapInPandas, ordered
                  merge-reduce via applyInPandas, compute-cache incrementality.
                  (ref: library/models/lens.js, library/workers/*)
- ``codecs``    — M3 wire codecs: JSON(+tagged), JSON-lines, CBOR, YAML,
                  msgpack, XML/JsonML.  (ref: library/models/codec/*)
- ``queries``   — the oracle-paired gate registry (relational surface,
                  lens/store/codec/events/pipeline gates) backing
                  ``__spark_entry__.py``; ``joins`` holds the
                  skew-mitigation join/agg strategies.
- ``pipeline``  — LLM-data-pipeline operators: dedup, similarity search,
                  text analysis, multimodal plumbing.
- ``attachments`` — content-addressed blob store + GC anti-join.
- ``streaming`` — change feed + reactive lens rebuild on Structured Streaming.
"""

__version__ = "0.1.0"
