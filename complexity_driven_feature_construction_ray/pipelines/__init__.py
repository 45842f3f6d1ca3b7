from .model import LogisticRegressionNumpy, stratified_folds, cv_score
from .search import ComplexityDrivenSearch, SearchResult, pareto_front
from .construct import ConstructionTransformer
from .fairexp import rod_measure, gap_measure, sffs_repair, drop_nan_inf

__all__ = [
    "LogisticRegressionNumpy",
    "stratified_folds",
    "cv_score",
    "ComplexityDrivenSearch",
    "SearchResult",
    "pareto_front",
    "ConstructionTransformer",
    "rod_measure",
    "gap_measure",
    "sffs_repair",
    "drop_nan_inf",
]
