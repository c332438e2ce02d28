from youcruit_tap_rawpostgresql_spark.cli import main

raise SystemExit(main())
