"""``python -m tmdataloader_spark`` → the tm_etl-equivalent CLI."""

import sys

from tmdataloader_spark.cli import main

sys.exit(main())
