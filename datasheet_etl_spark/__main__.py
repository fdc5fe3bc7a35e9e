"""``python -m datasheet_etl_spark`` — CLI entry point."""

import sys

from datasheet_etl_spark.cli import main

sys.exit(main())
