from .token_table import (
    token_table_dataset,
    token_table_arrow,
    write_token_table,
    TOKEN_TABLE_SCHEMA,
)

__all__ = [
    "token_table_dataset",
    "token_table_arrow",
    "write_token_table",
    "TOKEN_TABLE_SCHEMA",
]
