from .comm import AxisComm, Comm, SerialComm, dot, fused_dots, norm2

__all__ = ["AxisComm", "Comm", "SerialComm", "dot", "fused_dots", "norm2"]
