import sys

from go_spatial_spark.cli import main

sys.exit(main())
