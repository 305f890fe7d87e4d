"""Codec-layer queries for the correctness gate (SURVEY §2.1 decode sources /
encode sinks, §2.8 transcoding).

``codec_transcode_roundtrip`` pushes every documents row through a full
binary transcode chain *inside Spark executors* — value → CBOR → value →
msgpack → value (Arrow-batched ``mapInPandas``) — and projects the result;
the DuckDB oracle reads the source parquet directly, so a hash match proves
the whole codec stack is lossless at scale, not just in unit tests.
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register
from ._util import load, tracked_mkdtemp

TRANSCODE_SCHEMA = "doc_id long, lang string, text string, n_bytes_cbor long"


def codec_transcode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from ..codecs import CODECS

        cbor, msgpack = CODECS["cbor"], CODECS["msgpack"]
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "lang", "text", "n_bytes_cbor")}
            for r in pdf.itertuples(index=False):
                value = {"doc_id": int(r.doc_id), "lang": r.lang, "text": r.text}
                blob = cbor.encode(value)
                v2 = cbor.decode(blob)
                v3 = msgpack.decode(msgpack.encode(v2))
                rows["doc_id"].append(v3["doc_id"])
                rows["lang"].append(v3["lang"])
                rows["text"].append(v3["text"])
                rows["n_bytes_cbor"].append(len(blob))
            yield pd.DataFrame(rows)

    return docs.mapInPandas(run, schema=TRANSCODE_SCHEMA).select(
        "doc_id", "lang", F.length("text").alias("text_len"), "n_bytes_cbor")


# CBOR size is computable in SQL: map header (1B, 3 keys) + per-pair text
# header + payload.  Definite-length text header: 1B for len<24, 2B for
# len<256, 3B for len<65536; int header: 1B for 0..23, 2B to 0xff, 3B to
# 0xffff, 5B to 0xffffffff, 9B above.
_HDR = ("CASE WHEN {n} < 24 THEN 1 WHEN {n} < 256 THEN 2 "
        "WHEN {n} < 65536 THEN 3 ELSE 5 END")
_INT = ("CASE WHEN {v} < 24 THEN 1 WHEN {v} < 256 THEN 2 WHEN {v} < 65536 "
        "THEN 3 WHEN {v} < 4294967296 THEN 5 ELSE 9 END")

_TRANSCODE_ORACLE = f"""
WITH sized AS (
  SELECT doc_id, lang, LENGTH(text) AS text_len,
         octet_length(encode(text)) AS text_bytes,
         octet_length(encode(lang)) AS lang_bytes
  FROM documents
)
SELECT doc_id, lang, text_len,
       CAST(1
         + (1 + {_HDR.format(n='6')} - 1 + 6) + {_INT.format(v='doc_id')}
         + (1 + 4) + ({_HDR.format(n='lang_bytes')} + lang_bytes)
         + (1 + 4) + ({_HDR.format(n='text_bytes')} + text_bytes)
         AS BIGINT) AS n_bytes_cbor
FROM sized
"""
# breakdown: 0xA3 map(3) = 1; key "doc_id" = 1-byte text hdr + 6; int value;
# key "lang" = 1+4; lang text hdr+payload; key "text" = 1+4; text hdr+payload.

register("codec_transcode_roundtrip", codec_transcode_roundtrip,
         _TRANSCODE_ORACLE)


_CSV_DIRS: dict = {}


def csv_dirty_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source with production dirt (SURVEY §2.1 sources — the one
    text interchange format every training-data lake still ingests):
    the fixture file is written with Python's csv writer from documents
    rows, so commas and quotes in text get RFC-4180 quoting; every 7th
    doc additionally gets a REAL embedded newline (first space
    replaced), forcing ``multiLine`` reassembly; a planted row carries
    a non-numeric doc_id and must surface in PERMISSIVE mode's
    ``_corrupt_record`` (two live lessons: extra-column rows are NOT
    corrupt to the univocity parser — it ignores trailing tokens — and
    consecutive corrupt lines fold into ONE corrupt record in multiLine
    mode) — the gate emits only clean rows, so a parser
    that splits a quoted field, loses a multiline row, or admits a
    corrupt row changes rows/values.

    The oracle never parses CSV: it recomputes doc_id/lang/text_len from
    the documents table (newline injection is 1-char-for-1-char, so
    lengths are unchanged) — structurally independent of the quoting
    round-trip under test.  Scale: spark.read.csv is a distributed
    parallel scan; multiLine=true documents its real cost (file-level
    parallelism, not split-level) as the trade for embedded newlines.
    """
    import csv
    import os

    key = (sf_dir, "csv")
    if key not in _CSV_DIRS:
        rows = (load(spark, sf_dir, "documents")
                .where(F.col("doc_id") < 100)
                .select("doc_id", "lang", "text")
                .orderBy("doc_id").collect())
        d = tracked_mkdtemp("po_csv_")
        path = os.path.join(d, "docs.csv")
        with open(path, "w", newline="", encoding="utf-8") as f:
            w = csv.writer(f)
            w.writerow(["doc_id", "lang", "text"])
            for r in rows:
                text = r["text"]
                if r["doc_id"] % 7 == 0 and " " in text:
                    text = text.replace(" ", "\n", 1)
                w.writerow([r["doc_id"], r["lang"], text])
            # ONE unparseable trailing line: in multiLine mode the
            # parser folds consecutive bad lines into a single corrupt
            # record (and can swallow the following line as a quoted
            # continuation — observed live), so exactly one planted
            # corrupt row at EOF is the deterministic form
            f.write("not_a_number,xx,junk row\n")
        _CSV_DIRS[key] = path
    df = (spark.read
          .option("header", "true")
          .option("multiLine", "true")
          # RFC-4180 quote-doubling: Spark's default escape is backslash,
          # which leaves csv.writer's "" forms RAW in the value
          .option("escape", '"')
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .schema("doc_id long, lang string, text string, "
                  "_corrupt_record string")
          .csv(_CSV_DIRS[key]))
    df = df.cache()     # required: corrupt-record queries need it stable
    n_bad = df.where(F.col("_corrupt_record").isNotNull()).count()
    if n_bad != 1:
        raise AssertionError(
            f"expected 1 corrupt row, parser saw {n_bad}")
    return (df.where(F.col("_corrupt_record").isNull())
            .select("doc_id", "lang",
                    F.length("text").alias("text_len")))


_CSV_ORACLE = """
SELECT doc_id, lang, LENGTH(text) AS text_len
FROM documents WHERE doc_id < 100
"""

register("csv_dirty_ingest", csv_dirty_ingest, _CSV_ORACLE)


# --------------------------------------------------------------------------
# Dirty JSONL ingest (r5 wave 14): the OTHER interchange format every
# training lake scans — semi-structured lines parsed with from_json in
# PERMISSIVE mode + columnNameOfCorruptRecord, the production stance at
# 100 TB where a single malformed line must not kill a 1000-executor job
# (FAILFAST) or silently vanish (DROPMALFORMED).  Probed semantics pinned
# by the gate: a TRUNCATED record nulls ALL fields (no partial fill) and
# lands in the corrupt column; unknown extra keys are NOT corrupt.  Two
# dirt classes cycle by doc_id (truncated object / plainly-not-JSON);
# corrupt rows stay IN the output with is_corrupt=true, so an engine
# that drops or partially parses them reds rows or values.  In-plan
# fixture (JVM concat builds the lines — no temp files, unlike the CSV
# gate where multiLine forces a real file); map-only, zero shuffle.
# Oracle recomputes every field from documents arithmetic.
# --------------------------------------------------------------------------


def json_dirty_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (load(spark, sf_dir, "documents")
            .where(F.col("doc_id") < 300)
            .select("doc_id", "lang", "n_chars"))
    did = F.col("doc_id")
    # COALESCE the payload fields: a future testdata round with NULL
    # lang/n_chars would null the whole concat (the context-chunks
    # lesson) — the oracle mirrors the same fallbacks
    good = F.concat(F.lit('{"id": '), did.cast("string"),
                    F.lit(', "lang": "'),
                    F.coalesce(F.col("lang"), F.lit("und")),
                    F.lit('", "n": '),
                    F.coalesce(F.col("n_chars"), F.lit(-1)).cast("string"),
                    F.lit('}'))
    truncated = F.concat(F.lit('{"id": '), did.cast("string"),
                         F.lit(', "lang"'))
    line = (F.when(did % 26 == 0, F.lit("plainly not json"))
            .when(did % 13 == 0, truncated)
            .otherwise(good))
    parsed = F.from_json(line, "id long, lang string, n long, _bad string",
                         {"mode": "PERMISSIVE",
                          "columnNameOfCorruptRecord": "_bad"})
    return (docs.select("doc_id", parsed.alias("p"))
            .select("doc_id",
                    F.col("p.id").alias("parsed_id"),
                    F.col("p.lang").alias("parsed_lang"),
                    F.col("p.n").alias("parsed_n"),
                    F.col("p._bad").isNotNull().alias("is_corrupt")))


_JSONL_ORACLE = """
SELECT doc_id,
       CASE WHEN doc_id % 13 = 0 THEN NULL ELSE doc_id END AS parsed_id,
       CASE WHEN doc_id % 13 = 0 THEN NULL
            ELSE COALESCE(lang, 'und') END AS parsed_lang,
       CASE WHEN doc_id % 13 = 0 THEN NULL
            ELSE COALESCE(n_chars, -1) END AS parsed_n,
       doc_id % 13 = 0 AS is_corrupt
FROM documents WHERE doc_id < 300
"""

register("json_dirty_ingest", json_dirty_ingest, _JSONL_ORACLE)


# --------------------------------------------------------------------------
# Parquet schema evolution (r5 wave 14): a dataset directory whose parts
# were written at different schema generations — part A (doc_id, lang),
# part B adds n_chars AND permutes the column order — read back with
# mergeSchema=true.  At 100 TB schema evolution is the NORMAL state (a
# year of daily drops never shares one schema); the gate pins the two
# merge rules silently violated by naive readers: columns reconcile BY
# NAME (not position — the permuted part B would swap lang/n_chars
# positionally), and rows from pre-evolution parts surface the added
# column as NULL, not as an error or a dropped row.  The oracle
# reconstructs both generations from documents arithmetic.
# --------------------------------------------------------------------------

_EVOL_DIRS: dict = {}


def parquet_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    if sf_dir not in _EVOL_DIRS:
        docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
        d = tracked_mkdtemp("po_evolve_")
        # generation A: two columns
        (docs.where(F.col("doc_id") < 150)
         .select("doc_id", "lang")
         .write.mode("overwrite").parquet(os.path.join(d, "gen=a")))
        # generation B: adds n_chars, and permutes column order on disk
        (docs.where(F.col("doc_id") >= 150)
         .select("n_chars", "doc_id", "lang")
         .write.mode("overwrite").parquet(os.path.join(d, "gen=b")))
        _EVOL_DIRS[sf_dir] = d
    df = (spark.read.option("mergeSchema", "true")
          .option("recursiveFileLookup", "true")
          .parquet(_EVOL_DIRS[sf_dir]))
    return df.select("doc_id", "lang", "n_chars")


_EVOL_ORACLE = """
SELECT doc_id, lang,
       CASE WHEN doc_id < 150 THEN NULL ELSE n_chars END AS n_chars
FROM documents WHERE doc_id < 300
"""

register("parquet_schema_evolution", parquet_schema_evolution, _EVOL_ORACLE)


# --------------------------------------------------------------------------
# ORC roundtrip (r5 wave 14): the second columnar wire format — training
# lakes inherit ORC from Hive-era producers, and a Spark-native engine
# must read it with the same fidelity as parquet.  The gate writes a
# documents slice (including an ARRAY column and a computed decimal —
# complex-type and exact-numeric fidelity, not just flat strings) as ORC
# files, reads them back with spark.read.orc, and hashes the contents
# against the documents-derived oracle: any encode/decode asymmetry in
# the format plumbing flips values.  DuckDB cannot read ORC — the oracle
# derives from the source table, which is the stronger form anyway
# (independent of the roundtrip under test).
# --------------------------------------------------------------------------

_ORC_DIRS: dict = {}


def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    if sf_dir not in _ORC_DIRS:
        d = tracked_mkdtemp("po_orc_")
        (load(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
         .select("doc_id", "lang",
                 F.array(F.col("doc_id"), F.col("n_chars")).alias("pair"),
                 F.col("n_chars").cast("decimal(18,3)").alias("kb_est"))
         .write.mode("overwrite").orc(d))
        _ORC_DIRS[sf_dir] = d
    df = spark.read.orc(_ORC_DIRS[sf_dir])
    return df.select(
        "doc_id", "lang",
        F.element_at("pair", 1).alias("p0"),
        F.element_at("pair", 2).alias("p1"),
        F.col("kb_est").cast("string").alias("kb_est"))


#: The decimal column is a pure CAST (no division — cross-engine decimal
#: division is the documented divergence class); the string form pins the
#: scale surviving the ORC roundtrip ('128.000', not '128').
_ORC_ORACLE = """
SELECT doc_id, lang, doc_id AS p0, n_chars AS p1,
       CAST(n_chars AS DECIMAL(18,3))::VARCHAR AS kb_est
FROM documents WHERE doc_id < 300
"""

register("orc_roundtrip", orc_roundtrip, _ORC_ORACLE)


# --------------------------------------------------------------------------
# Native XML ingest (r5 wave 14): the reference ships an XML/JsonML codec
# family (SURVEY §2.1/§2.8) — Spark 4 grew a NATIVE XML source, so the
# interchange surface gets first-class distributed scan treatment here
# instead of a driver-side codec only.  The payload plants the five XML
# metacharacters (< & " ' and a >) mid-string, so entity escaping on
# write AND unescaping on read are load-bearing — a writer that emits
# raw '<' produces unparseable rows, a reader that leaves '&amp;' flips
# the value hash.  Payloads are 'x'-bracketed so whitespace trimming
# options can't touch the comparison; text is COALESCEd (NULL-testdata
# lesson).  Oracle reconstructs the exact payload from documents.
# --------------------------------------------------------------------------

_XML_DIRS: dict = {}


def xml_native_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    if sf_dir not in _XML_DIRS:
        d = tracked_mkdtemp("po_xml_")
        payload = F.concat(
            F.lit("x"), F.substring(F.coalesce(F.col("text"), F.lit("")),
                                    1, 30),
            F.lit(" <&\"'> "), F.col("doc_id").cast("string"), F.lit("x"))
        (load(spark, sf_dir, "documents").where(F.col("doc_id") < 250)
         .select("doc_id", "lang", payload.alias("payload"))
         .write.mode("overwrite").format("xml").option("rowTag", "doc")
         .save(d))
        _XML_DIRS[sf_dir] = d
    return (spark.read.format("xml").option("rowTag", "doc")
            .load(_XML_DIRS[sf_dir])
            .select("doc_id", "lang", "payload"))


_XML_ORACLE = """
SELECT doc_id, lang,
       'x' || substring(COALESCE(text, ''), 1, 30) || ' <&"''> '
           || CAST(doc_id AS VARCHAR) || 'x' AS payload
FROM documents WHERE doc_id < 250
"""

register("xml_native_ingest", xml_native_ingest, _XML_ORACLE)


# --------------------------------------------------------------------------
# Avro ingest (r6): closes the documented Avro-source gap (VERDICT r5
# missing #3).  spark-avro (the DataSource module) is not deployable in
# this container, but the Avro CORE library IS on Spark's classpath — so
# the fixture is authored by the AUTHORITATIVE JVM implementation
# (GenericDatumWriter via py4j, driver-side, bounded) and decoded
# EXECUTOR-SIDE by the pure-Python OCF reader
# (sources/avro_reader.py) inside mapInPandas over a binaryFile scan —
# the same plumbing shape as the tar/WebP/MP3 kernels.  Both codecs
# (null + deflate) and the nullable-union / array branches are live in
# the fixture; the oracle reconstructs every value arithmetically from
# the row index, independent of any Avro machinery.  Cross-impl chain:
# JVM writes -> Python reads -> DuckDB arithmetic agrees.
#
# Scale shape: binaryFile listing scan + Arrow-batched per-file decode —
# embarrassingly parallel, no shuffle (one groupBy-free projection); at
# 100 TB this is "read a directory of Avro shards", file-parallel.
# --------------------------------------------------------------------------

_AVRO_DIRS: dict = {}

_AVRO_SCHEMA_JSON = (
    '{"type":"record","name":"Doc","fields":['
    '{"name":"doc_id","type":"long"},'
    '{"name":"lang","type":["null","string"]},'
    '{"name":"score","type":"double"},'
    '{"name":"tags","type":{"type":"array","items":"string"}}]}')


def _ensure_avro_fixture(spark: SparkSession, sf_dir: str) -> tuple:
    """Write n=min(300, |documents|) records across ceil(n/50) OCF files —
    even file index => deflate codec, odd => null — via the JVM library.
    Values are pure arithmetic in the row index i: lang NULL when i%7==0
    (union null branch live) else 'l'+str(i%5); score = i/8 (dyadic —
    exactly representable, engine-identical); tags = ['t0'..] of length
    i%4 (empty-array branch live)."""
    if sf_dir in _AVRO_DIRS:
        return _AVRO_DIRS[sf_dir]
    n = min(300, load(spark, sf_dir, "documents").count())
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(_AVRO_SCHEMA_JSON)
    d = tracked_mkdtemp("po_avro_")
    for k, start in enumerate(range(0, n, 50)):
        writer = jvm.org.apache.avro.generic.GenericDatumWriter(schema)
        dfw = jvm.org.apache.avro.file.DataFileWriter(writer)
        if k % 2 == 0:
            dfw.setCodec(
                jvm.org.apache.avro.file.CodecFactory.deflateCodec(5))
        dfw.create(schema, jvm.java.io.File(f"{d}/part-{k:03d}.avro"))
        for i in range(start, min(start + 50, n)):
            rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
            rec.put("doc_id", jvm.java.lang.Long.valueOf(i))
            rec.put("lang", None if i % 7 == 0 else f"l{i % 5}")
            rec.put("score", jvm.java.lang.Double.valueOf(i / 8))
            arr = jvm.java.util.ArrayList()
            for j in range(i % 4):
                arr.add(f"t{j}")
            rec.put("tags", arr)
            dfw.append(rec)
        dfw.close()
    _AVRO_DIRS[sf_dir] = (d, n)
    return _AVRO_DIRS[sf_dir]


def avro_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    d, _n = _ensure_avro_fixture(spark, sf_dir)
    files = spark.read.format("binaryFile").load(f"{d}/*.avro") \
        .select("content")

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from ..sources.avro_reader import avro_file_records

        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "lang", "score",
                                    "n_tags", "tags_cat", "codec")}
            for blob in pdf["content"]:
                _schema, codec, records = avro_file_records(bytes(blob))
                for r in records:
                    rows["doc_id"].append(r["doc_id"])
                    rows["lang"].append(r["lang"])
                    rows["score"].append(r["score"])
                    rows["n_tags"].append(len(r["tags"]))
                    rows["tags_cat"].append("|".join(r["tags"]))
                    rows["codec"].append(codec)
            yield pd.DataFrame(rows)

    return files.mapInPandas(
        run, "doc_id long, lang string, score double, n_tags long, "
             "tags_cat string, codec string")


_AVRO_ORACLE = """
SELECT i AS doc_id,
       CASE WHEN i % 7 = 0 THEN NULL
            ELSE 'l' || CAST(i % 5 AS VARCHAR) END AS lang,
       CAST(i AS DOUBLE) / 8 AS score,
       CAST(i % 4 AS BIGINT) AS n_tags,
       CASE i % 4 WHEN 0 THEN '' WHEN 1 THEN 't0'
                  WHEN 2 THEN 't0|t1' ELSE 't0|t1|t2' END AS tags_cat,
       CASE WHEN (i // 50) % 2 = 0 THEN 'deflate' ELSE 'null' END AS codec
FROM (SELECT doc_id AS i FROM documents WHERE doc_id < 300) t
"""

register("avro_ingest", avro_ingest, _AVRO_ORACLE)
