from storage_crawler_spark.reports.queries import (  # noqa: F401
    first_thousand,
    large_old_files,
    status_averages,
    status_brief,
    status_events,
    status_full,
    table_schema,
)
from storage_crawler_spark.reports.render import to_csv_lines, to_json_doc  # noqa: F401
