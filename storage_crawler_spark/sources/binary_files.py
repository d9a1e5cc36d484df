"""``binaryFile`` source: crawl-with-content in one built-in scan.

Spark's binaryFile format reads (path, modificationTime, length, content)
per file — the built-in analog of the reference's walk+stat for the subset
of needs where file *content* is wanted too (multimodal columns, §2.9).
Unlike the frontier crawl (crawl/walker.py) it hides directories and
symlinks, so it complements rather than replaces the faithful crawl
(SURVEY.md §2.1 A2 note).

Scale notes: the scan is distributed and supports pathGlobFilter +
recursiveFileLookup pushdown; ``maxBytesPerFile`` guards executors against
huge blobs.  Content lands as a BinaryType column ready for the
mapInPandas decode/feature stages in operators/multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_binary_tree(
    spark: SparkSession,
    root: str,
    glob: str | None = None,
    recursive: bool = True,
    with_content: bool = True,
) -> DataFrame:
    """Scan a directory tree as (path BINARY, st_size, st_mtime, content).

    Columns align with the crawl's files vocabulary: ``path`` as bytes,
    ``st_size`` from length, ``st_mtime`` as truncated epoch seconds.
    ``with_content=False`` prunes the content column — Spark's reader then
    skips the byte payload entirely (column pruning reaches the source).
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.load(root)
    cols = [
        F.encode(F.regexp_replace(F.col("path"), "^file:", ""), "utf-8").alias("path"),
        F.col("length").alias("st_size"),
        F.col("modificationTime").cast("long").alias("st_mtime"),
    ]
    if with_content:
        cols.append(F.col("content"))
    return df.select(*cols)
