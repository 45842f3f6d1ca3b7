"""Ray-Data-native complexity-driven feature-construction engine.

A from-scratch rebuild of the semantics of
ricardo8914/Complexity-Driven-Feature-Construction (reference at
/root/reference, read-only) as streaming Ray Data stages over Parquet
tables of pre-tokenized training sequences
(doc_id:string, tokens:list<int32>, n_tok:int32, source:string).

Layout:
- sources/    deterministic synthetic token-table generator, parquet readers
- functions/  the feature algebra: expression trees, Arrow/numpy kernels,
              property propagation, sympy canonicalization
- stages/     distributed stages: stats pass, grouped aggregates,
              backfill, as-of join, windows, dedup, similarity, text
- pipelines/  the complexity-driven search + flagship end-to-end pipeline
- state/      checkpoint / lineage store for resumable backfill
"""

__version__ = "0.1.0"
