from .params import Param, ParameterList, make_params
from .timers import GLOBAL_TIMERS, TimerRegistry, profiling_region
from .output import MsgType, OutputManager
from . import behavior, checkpoint, perf_archive, xml_params
from .perf_archive import PerfArchive
from .xml_params import read_xml, write_xml

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
    "checkpoint",
    "perf_archive",
    "xml_params",
    "PerfArchive",
    "read_xml",
    "write_xml",
]
