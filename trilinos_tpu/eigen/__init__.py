from .lanczos import arnoldi, lanczos_eigs
from .lobpcg import EigenResult, lobpcg, power_method

__all__ = ["arnoldi", "lanczos_eigs", "EigenResult", "lobpcg",
           "power_method"]
