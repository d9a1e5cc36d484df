from storage_crawler_spark.cli import main

raise SystemExit(main())
