"""Python-worker daemon with preloaded numeric stack.

pyspark forks each task worker from a daemon process
(``pyspark/daemon.py``).  With ``spark.python.worker.reuse=false``
(see session.py — reused workers intermittently stall whole stages in
local mode) every task pays the numpy/pandas/pyarrow import (~0.5-1 s
under a 32-way fork storm).  Importing them HERE, in the daemon, lets
every forked worker inherit the loaded modules copy-on-write for free.

Wired up via ``spark.python.daemon.module=go_spatial_spark.daemon``.
"""

import numpy   # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401
import pyarrow.pandas_compat  # noqa: F401  (lazy-loaded on first Arrow batch otherwise)

import pyspark.daemon


if __name__ == "__main__":
    pyspark.daemon.manager()
