from .token_table import (
    token_table_dataset,
    token_table_arrow,
    write_token_table,
    TOKEN_TABLE_SCHEMA,
)
from .readers import read_table, write_table, dataset_from_arrays, hash_split

__all__ = [
    "token_table_dataset",
    "token_table_arrow",
    "write_token_table",
    "TOKEN_TABLE_SCHEMA",
    "read_table",
    "write_table",
    "dataset_from_arrays",
    "hash_split",
]
