from filters_spark.engine.stats import (
    column_stats,
    embedding_sanity,
    robust_outliers,
    volume_anomaly,
)
from filters_spark.engine.uniqueness import duplicate_keys, salted_agg
from filters_spark.engine.referential import (
    conv_fingerprints,
    duplicate_convs,
    gapless_by_agg,
    gaps_by_window,
    orphans,
    conv_profile,
    monotone_ts_violations,
    transition_counts,
    transition_violations,
    turn_latency,
)
from filters_spark.engine.drift import (
    frequencies,
    js_divergence,
    kl_divergence,
    chi2_statistic,
    ks_statistic,
    psi,
    psi_from_histograms,
    quantile_shift,
    wasserstein_distance,
)
from filters_spark.engine.explode import explode_validate
from filters_spark.engine.rules import (
    fd_violations,
    rule_summary,
    rule_violations,
)
from filters_spark.engine.suite import (
    ValidationSuite,
    violations_with_values,
)
from filters_spark.engine.checkpoint import CheckpointManifest, run_resumable
from filters_spark.engine.handlers import (
    FilterError,
    error_codes,
    errors_by_key,
    errors_by_record,
    explode_violations,
    fail_fast,
    log_violations,
)

__all__ = [
    "CheckpointManifest",
    "FilterError",
    "ValidationSuite",
    "violations_with_values",
    "column_stats",
    "embedding_sanity",
    "robust_outliers",
    "volume_anomaly",
    "duplicate_keys",
    "error_codes",
    "errors_by_key",
    "errors_by_record",
    "explode_validate",
    "explode_violations",
    "fail_fast",
    "log_violations",
    "frequencies",
    "gapless_by_agg",
    "gaps_by_window",
    "js_divergence",
    "kl_divergence",
    "chi2_statistic",
    "ks_statistic",
    "quantile_shift",
    "wasserstein_distance",
    "orphans",
    "psi",
    "psi_from_histograms",
    "fd_violations",
    "rule_summary",
    "rule_violations",
    "run_resumable",
    "salted_agg",
    "conv_fingerprints",
    "conv_profile",
    "duplicate_convs",
    "monotone_ts_violations",
    "transition_counts",
    "transition_violations",
    "turn_latency",
]
