from .params import Param, ParameterList, make_params
from .timers import GLOBAL_TIMERS, TimerRegistry, profiling_region
from .output import MsgType, OutputManager
from . import behavior

__all__ = [
    "Param",
    "ParameterList",
    "make_params",
    "GLOBAL_TIMERS",
    "TimerRegistry",
    "profiling_region",
    "MsgType",
    "OutputManager",
    "behavior",
]
