from .harwell_boeing import read_hb
from .matrix_market import (
    read_dense,
    read_sparse,
    read_sparse_distributed,
    write_dense,
    write_sparse,
)

__all__ = [
    "read_hb",
    "read_dense",
    "read_sparse",
    "read_sparse_distributed",
    "write_dense",
    "write_sparse",
]
