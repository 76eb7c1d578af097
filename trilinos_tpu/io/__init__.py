from .container import (BinaryContainer, read_coo, read_csr,
                        write_coo, write_csr)
from .harwell_boeing import read_hb
from .vtk import read_vtk, write_vtk, write_vtk_series
from .matrix_market import (
    read_dense,
    read_sparse,
    read_sparse_distributed,
    write_dense,
    write_sparse,
)

__all__ = [
    "BinaryContainer",
    "read_coo",
    "write_coo",
    "read_csr",
    "write_csr",
    "read_hb",
    "read_dense",
    "read_sparse",
    "read_sparse_distributed",
    "write_dense",
    "write_sparse",
    "read_vtk",
    "write_vtk",
    "write_vtk_series",
]
