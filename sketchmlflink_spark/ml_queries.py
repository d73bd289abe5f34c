"""ML-surface registry entries (SURVEY.md §2.4-2.6 operators exposed to
the driver harness over the `embeddings` table).

The training arms themselves live in sketchmlflink_spark/ml/; entries
here adapt them onto (spark, sf_dir) → DataFrame. Deterministic
fixed-weight prediction and dimension inference are SQL-expressible and
hash-checked; iterative training is rows-only per the driver contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sketchmlflink_spark.functions.vector import as_double_array, dot
from sketchmlflink_spark.operators.relational import t
from sketchmlflink_spark.registry import register

EMBED_DIM = 64
# Deterministic non-trivial weights: w_i = ((i*37) % 21 - 10) / 10
FIXED_WEIGHTS = [((i * 37) % 21 - 10) / 10.0 for i in range(EMBED_DIM)]
FIXED_INTERCEPT = 0.5


# --------------------------------------------------------------------------
# m01 — predict: y = x·w + b (M6/M7 in SURVEY.md §2.5;
# SketchMultipleLinearRegression.scala:166-171). Pure Catalyst dot.
# --------------------------------------------------------------------------
@register(
    "m01_linear_predict",
    oracle=f"""
SELECT vec_id,
       round(list_dot_product(CAST(embedding AS DOUBLE[]),
                              {FIXED_WEIGHTS}::DOUBLE[]) + {FIXED_INTERCEPT}, 6) AS prediction
FROM embeddings
""",
    tags=("ml", "predict"),
)
def m01_linear_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear prediction with fixed deterministic weights — the predict
    operator isolated from training, hash-checked against DuckDB."""
    emb = t(spark, sf_dir, "embeddings")
    w = F.array(*[F.lit(x) for x in FIXED_WEIGHTS])
    pred = dot(as_double_array("embedding"), w) + F.lit(FIXED_INTERCEPT)
    return emb.select("vec_id", F.round(pred, 6).alias("prediction"))


# --------------------------------------------------------------------------
# m02 — dimension inference (S3 in SURVEY.md §2.1: global max over
# feature indices; here max embedding length).
# --------------------------------------------------------------------------
@register(
    "m02_dimension_inference",
    oracle="SELECT CAST(max(len(embedding)) AS BIGINT) AS dim FROM embeddings",
    tags=("ml", "ingest"),
)
def m02_dimension_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return emb.agg(F.max(F.size("embedding")).cast("long").alias("dim"))


# --------------------------------------------------------------------------
# m03/m04 — the two training arms (A/B protocol of the reference,
# Test.scala:43-117): exact SGD vs sketch-compressed SGD on a
# deterministic synthetic regression target over embeddings.
# Iterative training is not ANSI-SQL-expressible → rows-only checks;
# convergence/accuracy asserted in tests/test_sgd.py.
# --------------------------------------------------------------------------
def _training_df(spark: SparkSession, sf_dir: str, emb: DataFrame | None = None) -> DataFrame:
    """label = x·w* + b* + deterministic 'noise' derived from vec_id
    (no RNG at query time — reproducible across runs and engines).
    ``emb`` overrides the source (the streaming incremental trainer
    passes its micro-batch here)."""
    if emb is None:
        emb = t(spark, sf_dir, "embeddings")
    w = F.array(*[F.lit(x) for x in FIXED_WEIGHTS])
    noise = (F.pmod(F.col("vec_id") * 2654435761, F.lit(1000)) - 500) / 50000.0
    return emb.select(
        F.col("vec_id"),
        as_double_array("embedding").alias("features"),
        (dot(as_double_array("embedding"), w) + F.lit(FIXED_INTERCEPT) + noise).alias("label"),
    )


@register(
    "m03_sgd_exact_metrics",
    oracle=None,
    tags=("ml", "train", "exact-arm"),
)
def m03_sgd_exact_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (uncompressed) arm: 5 epochs, step 0.5, eta/sqrt(t) — the
    reference's canonical config (README.md:15). Returns the reference's
    CSV_Line metric row (Test.scala:71-77 schema)."""
    from sketchmlflink_spark.ml.regression import MultipleLinearRegression

    df = _training_df(spark, sf_dir)
    mlr = MultipleLinearRegression(iterations=5, step_size=0.5, compression="None")
    return mlr.fit_evaluate_report(spark, df)


@register(
    "m06_libsvm_cli_e2e",
    oracle=None,
    tags=("ml", "e2e", "libsvm", "cli"),
)
def m06_libsvm_cli_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ACTUAL CLI pipeline end-to-end (Test.scala:38-77):
    LibSVM text scan → parse (comment/1-based/strict) → dimension
    inference → 75/25 split → sketch-arm fit → evaluate → the CSV_Line
    metrics row. Runs through experiment.run_experiment, i.e. the same
    code path as ``python -m sketchmlflink_spark.experiment``.

    The LibSVM fixture is the embeddings training frame serialized once
    to text under a deterministic temp path (Spark write, no driver
    collect) — fixture plumbing, not an operator; the operator under
    test is the ingest+train pipeline. Rows-only by contract (iterative
    training; timing columns are inherently run-varying)."""
    import os
    import tempfile

    from sketchmlflink_spark.experiment import build_arg_parser, run_experiment

    fixture_dir = os.path.join(
        tempfile.gettempdir(),
        "libsvm_fixture_" + sf_dir.strip("/").replace("/", "_"),
    )
    marker = os.path.join(fixture_dir, "_SUCCESS")
    if not os.path.exists(marker):
        df = _training_df(spark, sf_dir)
        pairs = F.transform(
            "features",
            lambda x, i: F.concat((i + 1).cast("string"), F.lit(":"), x.cast("string")),
        )
        lines = df.select(
            F.concat_ws(" ", F.col("label").cast("string"), F.array_join(pairs, " ")).alias(
                "value"
            )
        )
        lines.coalesce(1).write.mode("overwrite").text(fixture_dir)
    args = build_arg_parser().parse_args(
        [
            "--inputTrain", fixture_dir,
            "--iterations", "5",
            "--stepSize", "0.5",
            "--compressionType", "Sketch",
            "--sketchOrFlink", "Sketch",
        ]
    )
    row = run_experiment(spark, args)
    return spark.createDataFrame([row]).select(
        "sketch_or_flink", "parallelism", "iterations", "step_size",
        "compression_type", "input_file", "max_dim", "total_time_ms",
        "time_per_epoch_ms", "absolute_error", "avg_error",
    )


HASH_DIM = 1 << 17  # 131072 — wide-sparse regime (dim ≥ 1e5)


def _sparse_training_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide sparse COO training set via the hashing trick over document
    tokens: indices = hash(token) mod 2^17, values = 1.0 per occurrence
    (a multiset feature map — duplicate indices sum downstream). The
    label is linear in the features (0.01 per token) plus deterministic
    vec_id-free 'noise', so the regression is learnable and the whole
    construction is reproducible with no RNG.

    Catalyst-only feature extraction; the sparse arm (ml/sgd.py
    _blockify_sparse) consumes it without densifying — the reference's
    wide-LibSVM workload shape (runtest.sh:34-36)."""
    docs = t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    noise = (F.pmod(F.col("doc_id") * 2654435761, F.lit(1000)) - 500) / 100000.0
    return (
        docs.select(
            "doc_id",
            F.transform(toks, lambda tk: F.pmod(F.hash(tk), F.lit(HASH_DIM)).cast("int")).alias(
                "indices"
            ),
            F.transform(toks, lambda _: F.lit(1.0)).alias("values"),
            (F.size(toks) * 0.01 + noise).alias("label"),
        )
        .where(F.size("indices") > 0)
    )


@register(
    "m05_sgd_sparse_metrics",
    oracle=None,
    tags=("ml", "train", "sparse-arm"),
)
def m05_sgd_sparse_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse-features arm: wide COO (dim 131072) hashing-trick features
    trained without densifying — the SparseVector branch of the
    reference (SketchGradientDescent.scala:198-217) as a first-class
    driver query. Rows-only (iterative training isn't SQL-expressible);
    convergence/parity asserted in tests/test_sgd.py."""
    from sketchmlflink_spark.ml.regression import MultipleLinearRegression

    df = _sparse_training_df(spark, sf_dir)
    mlr = MultipleLinearRegression(iterations=5, step_size=0.01, compression="Sketch")
    return mlr.fit_evaluate_report(
        spark, df, input_file="documents_hashing_trick", max_dim=HASH_DIM, dim=HASH_DIM
    )


@register(
    "m04_sgd_sketch_metrics",
    oracle=None,
    tags=("ml", "train", "sketch-arm"),
)
def m04_sgd_sketch_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-compressed arm (the reference's raison d'être): gradients
    quantile-quantized + minmax-sketched before aggregation."""
    from sketchmlflink_spark.ml.regression import MultipleLinearRegression

    from sketchmlflink_spark.config import SketchConfig

    df = _training_df(spark, sf_dir)
    # auto_fallback_nnz=0: force real sketching even at dim 64 so the
    # driver-visible arm exercises the codec, not the fallback
    mlr = MultipleLinearRegression(
        iterations=5, step_size=0.5, compression="Sketch",
        sketch_cfg=SketchConfig(auto_fallback_nnz=0),
    )
    return mlr.fit_evaluate_report(spark, df)


# --------------------------------------------------------------------------
# m07 — LearningRateMethod sweep: all five FlinkML schedules, one query.
# --------------------------------------------------------------------------
LR_SCHEDULES = ("inv_sqrt", "constant", "bottou", "inv_scaling", "xu")


@register(
    "m07_lr_schedule_sweep",
    oracle=None,
    tags=("ml", "train", "lr-schedule"),
)
def m07_lr_schedule_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact-arm training per FlinkML LearningRateMethod (Default/
    inv_sqrt, Constant, Bottou, InvScaling, Xu —
    FlinkMultipleLinearRegression.scala:116-119), same data/seed/epochs,
    reporting each schedule's final epoch loss — the sweep a user runs to
    pick a schedule, as a single driver query. Rows-only (iterative);
    closed-form schedule values are unit-tested in test_sgd.py. Scale
    shape: each arm is the m03 treeReduce epoch loop; arms run
    sequentially sharing the cached training blocks, so the corpus is
    blockified once."""
    from sketchmlflink_spark.config import SketchConfig, SolverConfig
    from sketchmlflink_spark.ml import sgd as SGD

    df = _training_df(spark, sf_dir)
    rows = []
    for sched in LR_SCHEDULES:
        cfg = SolverConfig(
            iterations=3,
            step_size=0.5,
            lr_schedule=sched,
            # Bottou/Xu schedules are parameterized by lambda; InvScaling
            # by its decay exponent — pick values that keep all five
            # curves distinct (lambda=0 Xu or decay=0.5 InvScaling would
            # degenerate to Constant / Default)
            reg_lambda=0.1 if sched in ("bottou", "xu") else 0.0,
            lr_decay=0.25 if sched == "inv_scaling" else 0.5,
        )
        res = SGD.train(df, cfg, SketchConfig(compression_type="None"))
        rows.append(
            {
                "lr_schedule": sched,
                "epochs_run": int(res.epochs_run),
                "final_loss": round(float(res.losses[-1]), 6),
            }
        )
    return spark.createDataFrame(rows).select("lr_schedule", "epochs_run", "final_loss")
