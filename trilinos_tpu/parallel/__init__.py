from .comm import AxisComm, Comm, SerialComm, dot, fused_dots, norm2
from . import partition
from .map import Map
from .mdarray import (MDMap, halo_pad, md_dot, md_map_apply,
                      md_poly_apply, md_poly_local, md_solve)

__all__ = ["AxisComm", "Comm", "SerialComm", "dot", "fused_dots",
           "norm2", "partition", "Map", "MDMap", "halo_pad", "md_dot",
           "md_map_apply", "md_solve", "md_poly_apply", "md_poly_local"]
