"""`python -m velostream_spark ...` — see cli.py for the subcommands."""

from velostream_spark.cli import main

raise SystemExit(main())
