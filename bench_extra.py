#!/usr/bin/env python
"""Optimization-round measurement harness (bench.py is FROZEN; this file
holds the extra instrumentation the optimization guide §1 asks for).

Times individual queries with the same session/config/methodology as
bench.py (noop sink, best-of-N in one warm session) and optionally dumps
``explain("formatted")`` per query to plans/<tag>/<query>.txt.

Usage:
  python bench_extra.py [--repeats N] [--plans TAG] [--sf DIR] [q ...]

With no query names: the bench.py HEADLINE list.  Prints one JSON line of
{name: best_sec} plus a floor probe (empty-plan noop) so fixed overhead is
visible.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import bench  # frozen harness: reuse session + HEADLINE so setups match


def main() -> None:
    args = sys.argv[1:]
    repeats = 3
    plans_tag = None
    sf_dir = bench.SF_DIR
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--repeats":
            repeats = int(args[i + 1]); i += 2
        elif args[i] == "--plans":
            plans_tag = args[i + 1]; i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1
    if not names:
        names = list(bench.HEADLINE)

    import __spark_entry__ as entrymod

    spark = bench.make_session(bench.CPUS)
    out = {}
    try:
        qs = entrymod.queries()
        # floor probe: a 1-row noop write through the same machinery
        t0 = time.time()
        spark.range(1).write.format("noop").mode("overwrite").save()
        out["_floor_first"] = round(time.time() - t0, 3)
        t0 = time.time()
        spark.range(1).write.format("noop").mode("overwrite").save()
        out["_floor_warm"] = round(time.time() - t0, 3)

        if plans_tag:
            pdir = os.path.join(REPO, "plans", plans_tag)
            os.makedirs(pdir, exist_ok=True)
            for name in names:
                df = qs[name](spark, sf_dir)
                with open(os.path.join(pdir, "%s.txt" % name), "w") as fh:
                    fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))

        for name in names:
            spark.sparkContext.setJobDescription("bench_extra: %s" % name)
            samples = []
            for _ in range(repeats):
                t0 = time.time()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
                samples.append(round(time.time() - t0, 3))
            out[name] = {"best": min(samples), "all": samples}
            spark.sparkContext.setJobDescription(None)
    finally:
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
