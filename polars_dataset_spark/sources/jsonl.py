"""JSONL (newline-delimited JSON) source/sink — THE interchange format
of LLM training data (every public corpus release, every data-loader
expects it), so the engine needs a first-class, scale-correct reader
beside parquet/CSV/WARC.

Scale rules baked in (each one a real 100 TB failure mode):

- **Pass an explicit schema.** Schema inference is a FULL EXTRA SCAN
  of every byte before the real job starts; at corpus scale that
  doubles the read. ``read_jsonl`` takes ``schema`` (DDL string or
  StructType) and only falls back to inference when it is omitted —
  with a warning in the docstring, not a silent double-scan surprise.
- **Corrupt lines are data, not exceptions.** PERMISSIVE mode with an
  explicit ``columnNameOfCorruptRecord``: a malformed line lands in
  ``_corrupt_record`` with every schema field null, the job never
  dies at line 47-billion. (DROPMALFORMED silently eats data and
  FAILFAST kills the job — both wrong for curation; callers FILTER
  on the corrupt column and route bad lines to quarantine.)
- **One JSON object per line** (``multiLine=False``, the default):
  multiline JSON forces whole-file parsing — unsplittable, one task
  per file. JSONL splits on newlines like any text format, so a 1 TB
  file still fans out across the cluster.
- **Compression by extension** on write (``.jsonl.gz`` etc. handled by
  Spark's codec inference); gzip inputs are readable but UNSPLITTABLE
  — prefer zstd/bzip2 or many medium files for parallel reads.

Reference envelope: `/root/reference/polars_dataset.py` reads only
TSV/CSV (``polars_dataset.py:309-338``); JSONL is the driver-mandated
training-data extension of the same Datafile idea.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["read_jsonl", "read_jsonl_split", "write_jsonl", "split_corrupt"]

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: "str | T.StructType | None" = None,
    corrupt_col: str = CORRUPT_COL,
) -> DataFrame:
    """Read newline-delimited JSON with the scale-correct settings
    (PERMISSIVE + explicit corrupt-record column + splittable
    line-mode). With ``schema`` given (STRONGLY recommended — omitting
    it costs a full inference pre-scan), the corrupt column is
    appended to it automatically."""
    reader = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .option("multiLine", "false")
    )
    if schema is not None:
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        if corrupt_col not in schema.fieldNames():
            schema = T.StructType(
                schema.fields + [T.StructField(corrupt_col, T.StringType())]
            )
        reader = reader.schema(schema)
    return reader.json(path)


def split_corrupt(
    df: DataFrame, corrupt_col: str = CORRUPT_COL
) -> "tuple[DataFrame, DataFrame]":
    """(good rows without the corrupt column, quarantine rows) — the
    routing every ingestion job needs. Good = corrupt column null;
    quarantine keeps ALL columns (schema fields null, the raw line in
    the corrupt column) — deliberately, because Spark DISALLOWS a
    query whose only required column from a raw JSON scan is the
    corrupt column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD
    — the alternative workaround is caching the whole parse, wrong at
    corpus scale). Both halves are plain filters over the same scan
    (no extra pass)."""
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull())
    return good, bad


def read_jsonl_split(
    spark: SparkSession,
    path: str,
    schema: "str | T.StructType",
    corrupt_col: str = CORRUPT_COL,
) -> "tuple[DataFrame, DataFrame]":
    """Read JSONL and split (good, quarantine) in ONE pass with NO
    corrupt-column query restriction: the file is scanned as text
    lines and parsed with ``from_json`` (same Jackson parser, same
    codegen), so corruption is an ordinary computed column — count it,
    filter it, aggregate it freely (the native reader's
    ``_corrupt_record`` forbids corrupt-only queries; see
    :func:`split_corrupt`). Schema is REQUIRED here — the text scan
    cannot infer. Good rows carry the schema fields; quarantine rows
    carry the raw line in ``corrupt_col``."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if corrupt_col not in schema.fieldNames():
        schema = T.StructType(
            schema.fields + [T.StructField(corrupt_col, T.StringType())]
        )
    parsed = spark.read.text(path).select(
        F.from_json(
            "value",
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
        ).alias("__j")
    )
    flag = F.col(f"__j.{corrupt_col}")
    good = parsed.filter(flag.isNull()).select("__j.*").drop(corrupt_col)
    bad = parsed.filter(flag.isNotNull()).select(flag.alias(corrupt_col))
    return good, bad


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: "str | None" = None,
    partitions: "int | None" = None,
) -> None:
    """Write newline-delimited JSON. ``compression`` in {gzip, bzip2,
    zstd, ...} (remember: gzip outputs are unsplittable on re-read);
    ``partitions`` repartitions first to control output file count —
    corpus releases want many medium files, not one giant one."""
    if partitions is not None:
        df = df.repartition(partitions)
    writer = df.write.mode(mode)
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.json(path)
