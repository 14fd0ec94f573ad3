"""spark-submit primary script: dispatch to ``ethereum_etl_spark.cli.main``.

The package code arrives via ``--py-files`` (the zip built by
``tools/submit.sh``), which spark-submit places on the driver and every
executor's PYTHONPATH; this file deliberately contains no logic so the
archive is the single source of code on the cluster.
"""

import sys

from ethereum_etl_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
