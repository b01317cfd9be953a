from apache_beam_challange_spark.cli import main

raise SystemExit(main())
