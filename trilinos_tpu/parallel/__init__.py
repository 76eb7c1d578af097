from .comm import AxisComm, Comm, SerialComm, dot, fused_dots, norm2
from . import partition
from .map import Map

__all__ = ["AxisComm", "Comm", "SerialComm", "dot", "fused_dots", "norm2", "partition", "Map"]
