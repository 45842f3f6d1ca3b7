from .model import LogisticRegressionNumpy, stratified_folds, cv_score
from .search import ComplexityDrivenSearch, SearchResult, pareto_front

__all__ = [
    "LogisticRegressionNumpy",
    "stratified_folds",
    "cv_score",
    "ComplexityDrivenSearch",
    "SearchResult",
    "pareto_front",
]
