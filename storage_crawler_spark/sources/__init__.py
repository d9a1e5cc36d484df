"""Sources & sinks (SURVEY.md §2.1/§2.2, build plan M3).

- :mod:`lake` — the primary sink: per-tag Parquet lake
  (``storcrawl_<tag>/files`` + ``/status``), range-partitioned by path so
  subtree queries prune on Parquet min/max stats;
- :mod:`jdbc` — PostgreSQL parity adapter: the reference's schema-per-tag
  DDL lifecycle (storcrawl.py:88-215) rendered from our StructType schemas,
  plus a batched JDBC writer (group-commit analog);
- :mod:`binary_files` — Spark's ``binaryFile`` source as the built-in
  analog of crawl + content: (path, modificationTime, length, content)
  for multimodal/binary processing;
- :mod:`fsmeta` — filesystem metadata as a registered Python Data Source
  (``spark.read.format("fsmeta")``) with stat-column filter pushdown into
  the listing stage — the custom-pushdown candidate of SURVEY.md §4.2.
"""

from storage_crawler_spark.sources.binary_files import read_binary_tree
from storage_crawler_spark.sources.fsmeta import register_fsmeta
from storage_crawler_spark.sources.jdbc import (
    files_table_ddl,
    schema_lifecycle_ddl,
    reporting_user_ddl,
    read_files_jdbc,
    status_table_ddl,
    write_files_jdbc,
    write_status_jdbc,
)
from storage_crawler_spark.sources.lake import (
    drop_tag,
    list_tags,
    read_files,
    read_status,
    write_crawl,
)

__all__ = [
    "read_binary_tree",
    "files_table_ddl",
    "status_table_ddl",
    "schema_lifecycle_ddl",
    "reporting_user_ddl",
    "write_files_jdbc",
    "write_status_jdbc",
    "read_files_jdbc",
    "write_crawl",
    "read_files",
    "read_status",
    "list_tags",
    "drop_tag",
]
