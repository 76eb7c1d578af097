"""Teuchos-format XML ParameterList reader/writer.

Analogue of ``Teuchos::XMLParameterListHelpers``
(packages/teuchos/comm/src/Teuchos_XMLParameterListHelpers.hpp) — reads the
reference's XML config format:

    <ParameterList name="solver">
      <Parameter name="Convergence Tolerance" type="double" value="1e-8"/>
      <ParameterList name="prec">...</ParameterList>
    </ParameterList>

so existing Trilinos XML configs drive this framework unchanged.
"""
from __future__ import annotations

import xml.etree.ElementTree as ET

from .params import ParameterList

_PARSERS = {
    "int": int,
    "double": float,
    "float": float,
    "string": str,
    "bool": lambda s: s.strip().lower() in ("true", "1", "yes"),
}


def _from_element(el: ET.Element) -> ParameterList:
    pl = ParameterList(name=el.get("name", ""))
    for child in el:
        if child.tag == "Parameter":
            name = child.get("name")
            typ = child.get("type", "string").lower()
            raw = child.get("value", "")
            pl[name] = _PARSERS.get(typ, str)(raw)
        elif child.tag == "ParameterList":
            pl[child.get("name", "")] = _from_element(child)
    return pl


def read_xml(path_or_string) -> ParameterList:
    s = path_or_string
    if "\n" in str(s) or str(s).lstrip().startswith("<"):
        root = ET.fromstring(str(s))
    else:
        root = ET.parse(str(s)).getroot()
    if root.tag != "ParameterList":
        raise ValueError(f"expected <ParameterList> root, got <{root.tag}>")
    return _from_element(root)


def _type_of(v) -> str:
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "double"
    return "string"


def _to_element(pl: ParameterList, name: str) -> ET.Element:
    el = ET.Element("ParameterList", name=name)
    for k, v in pl.items():
        if isinstance(v, ParameterList):
            el.append(_to_element(v, k))
        else:
            ET.SubElement(el, "Parameter", name=k, type=_type_of(v),
                          value=str(v))
    return el


def write_xml(pl: ParameterList, path=None) -> str:
    el = _to_element(pl, pl.name or "ANONYMOUS")
    ET.indent(el)
    s = ET.tostring(el, encoding="unicode")
    if path is not None:
        with open(path, "w") as f:
            f.write(s)
    return s
