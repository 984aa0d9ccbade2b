"""Thin spark-submit driver script: the cluster ships
``dist/filters_spark.zip`` via ``--py-files`` and this file as the
application; all logic lives in :mod:`filters_spark.job`.

    spark-submit --master <cluster> --py-files dist/filters_spark.zip \\
        scripts/submit_main.py --input ... --output ...
"""

import sys

from filters_spark.job import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
