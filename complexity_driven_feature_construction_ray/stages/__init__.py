from .token_stats import add_token_stats, token_stats_dataset, TOKEN_STAT_COLS
from .stats import column_stats, base_features_from_stats
from .fit import fit_distributed
from .backfill import FeatureBackfill, backfill_dataset
from .temporal import asof_join, lag_lead, sessionize

__all__ = [
    "add_token_stats",
    "token_stats_dataset",
    "TOKEN_STAT_COLS",
    "column_stats",
    "base_features_from_stats",
    "fit_distributed",
    "FeatureBackfill",
    "backfill_dataset",
    "asof_join",
    "lag_lead",
    "sessionize",
]
