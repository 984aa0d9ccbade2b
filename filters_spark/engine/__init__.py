from filters_spark.engine.stats import column_stats
from filters_spark.engine.uniqueness import duplicate_keys, salted_agg
from filters_spark.engine.referential import (
    gapless_by_agg,
    gaps_by_window,
    orphans,
)
from filters_spark.engine.drift import frequencies, kl_divergence, psi
from filters_spark.engine.explode import explode_validate
from filters_spark.engine.suite import ValidationSuite
from filters_spark.engine.checkpoint import CheckpointManifest, run_resumable

__all__ = [
    "CheckpointManifest",
    "ValidationSuite",
    "column_stats",
    "duplicate_keys",
    "explode_validate",
    "frequencies",
    "gapless_by_agg",
    "gaps_by_window",
    "kl_divergence",
    "orphans",
    "psi",
    "run_resumable",
    "salted_agg",
]
