"""Source connectors (SURVEY.md §2.1 S1–S8).

Reference semantics re-expressed Spark-first:
- S1/S2/S3 TSV scans  -> one ``read_tsv`` with optional explicit schema
  (no low_memory/chunk concerns: Spark splits CSV input natively, which
  also replaces S4's 10k-row chunking).
- headerless ad-hoc lists (data_files/5.tsv, 6.tsv) -> ``read_headerless_tsv``
  with positional names.
- S5 per-file heterogeneous directory -> ``read_sources`` loops files
  (schemas differ so it can NOT be one multi-path scan) and applies the
  synonym registry per file; ``input_file_name()`` keeps provenance.
- S6 latest-file-by-mtime -> driver-side glob (filesystem concern, not
  engine), same as the reference (clean_contacts.py:239-245).
- S7/S8 SQLite staging -> JDBC read/write, gated on driver availability;
  the staging pattern itself is obsolete (Spark shuffle/spill is the
  out-of-core story).
"""

from __future__ import annotations

import glob as globmod
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType


def string_schema(cols: list[str]) -> StructType:
    return StructType([StructField(c, StringType(), True) for c in cols])


def read_tsv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    header: bool = True,
    all_strings: bool = False,
    nullify_empty: bool = True,
) -> DataFrame:
    """TSV scan (S1-S3). ``all_strings`` mirrors the reference's
    ``dtype=str`` loading mode but keeps NULLs real instead of '' — the
    two null conventions (SURVEY §1.2) unify at ingest."""
    reader = (
        spark.read.option("sep", "\t")
        .option("header", header)
        .option("mode", "PERMISSIVE")
    )
    if schema is not None:
        reader = reader.schema(schema)
    elif all_strings:
        header_cols = _peek_header(spark, path)
        reader = reader.schema(string_schema(header_cols))
    else:
        reader = reader.option("inferSchema", True)
    df = reader.csv(path)
    if nullify_empty:
        df = df.select(
            *[
                F.when(F.length(F.trim(F.col(c).cast("string"))) == 0, None)
                .otherwise(F.col(c))
                .alias(c)
                if isinstance(df.schema[c].dataType, StringType)
                else F.col(c)
                for c in df.columns
            ]
        )
    return df


def _peek_header(spark: SparkSession, path: str) -> list[str]:
    """First line of the input, split on tabs — read through Spark's text
    source (not a driver-side ``open()``), so the same code path works on
    object stores (s3a://, abfss://) and HDFS. For a glob the line comes
    from one of the matched files (Spark packs splits by size, so not
    necessarily the lexicographically first); a multi-file scan already
    contracts that every file shares the header, so any file's header
    serves."""
    first = spark.read.text(path).limit(1).take(1)
    line = first[0][0] if first else ""
    return [c.strip() for c in line.split("\t")]


def read_headerless_tsv(
    spark: SparkSession, path: str, colnames: list[str]
) -> DataFrame:
    """Headerless ad-hoc list with positional column names (S5 variants)."""
    return spark.read.option("sep", "\t").option("header", False).schema(
        string_schema(colnames)
    ).csv(path)


class SourceRegistry:
    """Synonym -> canonical column mapping (P4; fill_missing_contacts.py:
    188-192, merge_contacts_kindaworks.py:27-54).

    ``canonical`` maps each target column to its accepted source spellings
    (compared case-insensitively after strip). ``apply`` projects a raw
    source frame onto the canonical columns by coalescing the first
    NON-BLANK value along the synonym chain (synonym-priority order);
    targets with no matching column become NULL.

    The coalesce is a documented divergence from the reference, which
    keys and fills from only the FIRST phone-family column in file order
    (fill_missing_contacts.py:192,201 ``src_phones[0]``) and so drops
    the contact key of any row whose first phone cell is empty; here
    such a row falls back to its next non-blank synonym column."""

    def __init__(self, canonical: dict[str, list[str]]):
        self.canonical = canonical

    def apply(self, df: DataFrame, keep_provenance: bool = False) -> DataFrame:
        lookup = {}
        for col in df.columns:
            lookup.setdefault(col.strip().lower(), col)
        out = []
        for target, synonyms in self.canonical.items():
            hits = []
            for syn in [target, *synonyms]:
                hit = lookup.get(syn.strip().lower())
                if hit is not None and hit not in hits:
                    hits.append(hit)
            if not hits:
                out.append(F.lit(None).cast("string").alias(target))
            else:
                candidates = [
                    F.when(
                        F.length(F.trim(F.col(f"`{h}`").cast("string"))) > 0,
                        F.col(f"`{h}`").cast("string"),
                    )
                    for h in hits
                ]
                out.append(F.coalesce(*candidates).alias(target))
        if keep_provenance:
            out.append(F.input_file_name().alias("source_file"))
        return df.select(*out)


def read_sources(
    spark: SparkSession,
    paths: list[str],
    registry: SourceRegistry,
    header: bool = True,
) -> DataFrame:
    """S5 — heterogeneous multi-file source: per-file schema mapping via the
    registry, then a single unionByName. Provenance column included."""
    frames = []
    for p in paths:
        raw = read_tsv(spark, p, all_strings=header, header=header)
        frames.append(registry.apply(raw, keep_provenance=True))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def latest_file(directory: str, pattern: str = "*.tsv") -> str | None:
    """S6 — newest file by mtime (clean_contacts.py:239-245); a driver-side
    filesystem concern, exactly as in the reference."""
    files = globmod.glob(os.path.join(directory, pattern))
    return max(files, key=os.path.getmtime) if files else None


def jdbc_available(spark: SparkSession, driver: str = "org.sqlite.JDBC") -> bool:
    try:
        spark._jvm.java.lang.Class.forName(driver)  # noqa: SLF001
        return True
    except Exception:  # noqa: BLE001
        return False


def read_jdbc(
    spark: SparkSession, url: str, table: str, properties: dict | None = None
) -> DataFrame:
    """S8 — JDBC source (replaces the SQLite staged lookups; predicate
    pushdown comes from the JDBC source). Requires the driver jar on the
    classpath — check ``jdbc_available`` first."""
    return spark.read.jdbc(url, table, properties=properties or {})
