"""spark-submit entry point (north-rule CLI shape):

    spark-submit --py-files dist/engine.zip jobs/extract.py \
        --source catalog.db.pages --output-table catalog.db.extracted

Thin shim over :mod:`htmlcleanup_spark.plans.extract`.  On a cluster the
package arrives via --py-files; for a bare ``python jobs/extract.py`` run the
repo root is added to sys.path.
"""

import os
import sys

try:
    from htmlcleanup_spark.plans.extract import main
except ModuleNotFoundError:  # bare script run: package lives one level up
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from htmlcleanup_spark.plans.extract import main

if __name__ == "__main__":
    main()
