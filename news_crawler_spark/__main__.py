from news_crawler_spark.cli import main

raise SystemExit(main())
