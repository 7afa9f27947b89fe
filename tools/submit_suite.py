"""spark-submit entry script (north_rule: "run via spark-submit --py-files").

    python tools/make_pyfiles_zip.py             # → /tmp/pyad2_pyfiles.zip
    spark-submit --master local[8] \
        --py-files /tmp/pyad2_pyfiles.zip \
        tools/submit_suite.py --rows 100000 --cpus 8

The script only depends on the zipped package (no repo checkout needed on
executors).
"""

import sys

from pyanomalydetector2_spark.run_suite import main

if __name__ == "__main__":
    main(sys.argv[1:])
