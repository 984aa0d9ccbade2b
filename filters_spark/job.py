"""spark-submit entry point for the full validation job.

The BASELINE.json north rule runs the engine via ``spark-submit
--py-files`` on a multi-executor cluster::

    scripts/package.sh                      # builds dist/filters_spark.zip
    spark-submit --py-files dist/filters_spark.zip \\
        --master <cluster> \\
        -- scripts/submit_main.py \\
        --input  <parquet dir | iceberg table> \\
        --baseline <parquet dir | iceberg table | synthetic> \\
        --output /path/out --manifest /path/manifest

or locally, ``python -m filters_spark.job --synthetic 2000 --output /tmp/o``.

Reads the transcripts input, runs the ValidationSuite (row chains +
stats + uniqueness + referential + drift), writes
``verdicts/ violations/ stats/`` parquet under ``--output``, commits the
per-bucket checkpoint manifest as it goes (resume = rerun the same
command), and prints one summary JSON line on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import DataFrame, SparkSession

import filters_spark as fs
from filters_spark.engine.checkpoint import CheckpointManifest, run_resumable
from filters_spark.engine.suite import ValidationSuite


def default_rules() -> dict:
    """The transcript-schema rule set (BASELINE.json input_hint)."""
    return {
        "conv_id": fs.Required(),
        "turn_idx": fs.Min(0),
        "role": fs.Choice(("system", "user", "assistant", "tool")),
        "text": fs.Required()
        | fs.Unicode()
        | fs.Strip()
        | fs.MaxLength(2000, truncate=True),
        "tool": fs.Choice(("search", "code", "browser")),
    }


def load_table(spark: SparkSession, ref: str, fmt: str) -> DataFrame:
    if fmt == "iceberg":
        return spark.read.table(ref)
    return spark.read.parquet(ref)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="filters_spark.job")
    p.add_argument("--input", help="transcripts parquet path / iceberg table")
    p.add_argument("--format", choices=("parquet", "iceberg"), default="parquet")
    p.add_argument("--baseline", help="undrifted snapshot (same format)")
    p.add_argument(
        "--synthetic",
        type=int,
        metavar="N_CONVS",
        help="use the deterministic synthetic generator instead of --input",
    )
    p.add_argument("--output", required=True, help="output dir for result tables")
    p.add_argument("--manifest", help="checkpoint manifest dir (enables resume)")
    p.add_argument("--conv-col", default="conv_id")
    p.add_argument("--idx-col", default="turn_idx")
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument("--max-invalid-rate", type=float, default=0.05)
    p.add_argument("--buckets-per-job", type=int, default=8)
    p.add_argument(
        "--sketch-cols",
        help="comma-separated columns whose per-bucket HLL sketch state "
        "is checkpointed in the manifest and unioned on resume "
        "(accumulated sketch state; needs --manifest)",
    )
    p.add_argument(
        "--hist-cols",
        help="comma-separated columns whose per-bucket fixed-grid "
        "histograms (string columns by length — the PSI drift input) "
        "are checkpointed in the manifest and vector-added on resume; "
        "EXACTLY equal to a single-shot run (needs --manifest)",
    )
    p.add_argument("--hist-bins", type=int, default=32)
    p.add_argument(
        "--table-rules",
        help="JSON object of named TABLE-level boolean SQL predicates "
        '(cross-field invariants, e.g. {"tool_on_assistant": '
        "\"tool IS NULL OR role = 'assistant'\"}); evaluated on the "
        "raw rows in the same suite pass — verdicts gain a per-bucket "
        "rule_fails count that gates bucket_pass",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    spark = (
        SparkSession.builder.appName("filters_spark_validation")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )

    if args.synthetic:
        from filters_spark.data.transcripts import (
            transcripts,
            transcripts_baseline,
        )

        df = transcripts(spark, n_convs=args.synthetic)
        baseline = transcripts_baseline(spark, n_convs=args.synthetic // 4)
    else:
        if not args.input:
            print("either --input or --synthetic is required", file=sys.stderr)
            return 2
        df = load_table(spark, args.input, args.format)
        baseline = (
            load_table(spark, args.baseline, args.format)
            if args.baseline
            else None
        )

    table_rules = json.loads(args.table_rules) if args.table_rules else None
    if table_rules is not None and not (
        isinstance(table_rules, dict)
        and all(isinstance(v, str) for v in table_rules.values())
    ):
        print(
            "--table-rules must be a JSON object of name -> SQL predicate",
            file=sys.stderr,
        )
        return 2
    suite = ValidationSuite(
        default_rules(),
        conv=args.conv_col,
        idx=args.idx_col,
        n_buckets=args.n_buckets,
        max_invalid_rate=args.max_invalid_rate,
        table_rules=table_rules,
    )

    out = args.output.rstrip("/")
    if args.manifest:
        # run_resumable writes verdicts/violations per bucket group as it
        # goes (dynamic partition overwrite keyed by bucket), so the only
        # extra work here is the stats scan over the raw input — the
        # validation chains never run a second time.
        summary = run_resumable(
            df,
            suite,
            CheckpointManifest(args.manifest),
            baseline=baseline,
            buckets_per_job=args.buckets_per_job,
            output=out,
            sketch_cols=(
                args.sketch_cols.split(",") if args.sketch_cols else None
            ),
            hist_cols=(
                args.hist_cols.split(",") if args.hist_cols else None
            ),
            hist_bins=args.hist_bins,
        )
        from filters_spark.engine.stats import column_stats

        column_stats(df, suite.stat_columns).write.mode("overwrite").parquet(
            f"{out}/stats"
        )
        drift = suite.drift(df, baseline) if baseline is not None else {}
        summary["drift"] = drift
    else:
        result = suite.run(df, baseline=baseline)
        verdicts = result.verdicts.collect()
        summary = {
            "completed": len(verdicts),
            "n_rows": sum(r["n_rows"] for r in verdicts),
            "n_invalid": sum(r["n_invalid"] for r in verdicts),
            "dup_keys": sum(r["dup_keys"] for r in verdicts),
            "gappy_convs": sum(r["gappy_convs"] for r in verdicts),
            **(
                {"rule_fails": sum(r["rule_fails"] for r in verdicts)}
                if table_rules
                else {}
            ),
            "passed": all(r["bucket_pass"] for r in verdicts)
            and not result.metrics.get("drift_failed", False),
        }
        result.verdicts.write.mode("overwrite").parquet(f"{out}/verdicts")
        result.violations.write.mode("overwrite").parquet(f"{out}/violations")
        result.stats.write.mode("overwrite").parquet(f"{out}/stats")
        result.unpersist()
        summary["drift"] = result.metrics

    summary["output"] = out
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
