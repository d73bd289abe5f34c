#!/usr/bin/env python
"""Benchmark sweep — the reference's ``bin/runtest.sh`` (RT:31-43)
re-expressed: nested loops over parallelism x dimension x iterations with
stepSize=0.5 / threshold=0.001 fixed, one CSV_Line record per config.

Usage (argument order mirrors runtest.sh):
    python bin/sweep.py minIter maxIter iterStep minPar maxPar parStep \
        initDim finalDim dimStep trainingFile method compression [outPath]

Unlike the reference (one ``flink run`` JVM per config), the whole grid
runs in ONE SparkSession — on a cluster each config is still a fresh
training job; only the session bootstrap is amortized.
"""

from __future__ import annotations

import sys

REPO_ROOT = __file__.rsplit("/bin/", 1)[0]
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main(argv: list[str]) -> int:
    if len(argv) < 12:
        print(__doc__)
        return 1
    (min_it, max_it, it_step, min_par, max_par, par_step,
     init_dim, final_dim, dim_step) = (int(x) for x in argv[:9])
    training_file, method, compression = argv[9:12]
    out_path = argv[12] if len(argv) > 12 else f"sweep_{method}_{compression}.txt"

    from sketchmlflink_spark.experiment import build_arg_parser, format_log, run_experiment
    from sketchmlflink_spark.session import get_spark

    spark = get_spark("sketchmlflink-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    for par in range(min_par, max_par + 1, par_step):
        print(f"> Running with parallelism {par}")
        for dim in range(init_dim, final_dim + 1, dim_step):
            print(f">>> Truncating the data to {dim} dimensions")
            for iters in range(min_it, max_it + 1, it_step):
                print(f">>>>>> Running SGD with {iters} iterations")
                args = build_arg_parser().parse_args(
                    [
                        "--inputTrain", training_file,
                        "--parallelism", str(par),
                        "--iterations", str(iters),
                        "--stepSize", "0.5",          # RT:40 fixed
                        "--compressionType", compression,
                        "--threshold", "0.001",       # RT:41 fixed (inactive, Test:47)
                        "--sketchOrFlink", method,
                        "--maxDim", str(dim),
                    ]
                )
                text = format_log(run_experiment(spark, args))
                with open(out_path, "a") as fh:
                    fh.write(text)
                sys.stdout.write(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
