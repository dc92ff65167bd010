"""Arc labels (reference analogs: labelling/Label.java:72,
GammaCodedIntLabel.java:27, FixedWidthIntLabel.java:29,
FixedWidthIntListLabel.java:32).

A Label is a typed attribute container with a bit-stream serialization
contract: ``to_bitstream(obs, source_node)`` / ``from_bitstream(ibs,
source_node)`` and ``fixed_width()`` (-1 when variable).  Labels are
constructed from constructor-spec strings persisted in ``.properties``
(``labelspec`` key), reference-compatible, e.g.
``it.unimi.dsi.webgraph.labelling.GammaCodedIntLabel(FOO)``.
"""

from __future__ import annotations

import numpy as np


class Label:
    key: str = "LABEL"

    def copy(self) -> "Label":
        raise NotImplementedError

    def well_known_attribute_keys(self) -> list[str]:
        return [self.key]

    def get(self, key: str | None = None):
        raise NotImplementedError

    def set(self, value) -> None:
        raise NotImplementedError

    def fixed_width(self) -> int:
        return -1

    def to_bitstream(self, obs, source: int) -> int:
        raise NotImplementedError

    def from_bitstream(self, ibs, source: int) -> None:
        raise NotImplementedError

    def to_spec(self) -> str:
        raise NotImplementedError

    def __eq__(self, other):
        return type(self) is type(other) and self.get() == other.get()

    def __hash__(self):
        v = self.get()
        return hash((type(self).__name__, tuple(v) if isinstance(v, (list, np.ndarray)) else v))

    def __repr__(self):
        return f"{type(self).__name__}({self.key}={self.get()})"


class GammaCodedIntLabel(Label):
    """A natural integer stored in gamma coding
    (reference GammaCodedIntLabel.java:27)."""

    def __init__(self, key: str = "FOO", value: int = 0):
        self.key = key
        self.value = int(value)

    def copy(self):
        return GammaCodedIntLabel(self.key, self.value)

    def get(self, key=None):
        return self.value

    def set(self, value):
        self.value = int(value)

    def to_bitstream(self, obs, source: int) -> int:
        return obs.write_gamma(self.value)

    def from_bitstream(self, ibs, source: int) -> None:
        self.value = ibs.read_gamma()

    def to_spec(self) -> str:
        return f"it.unimi.dsi.webgraph.labelling.GammaCodedIntLabel({self.key})"


class FixedWidthIntLabel(Label):
    """An integer of fixed bit width (reference FixedWidthIntLabel.java:29)."""

    def __init__(self, key: str = "FOO", width: int = 32, value: int = 0):
        self.key = key
        self.width = int(width)
        self.value = int(value)

    def copy(self):
        return FixedWidthIntLabel(self.key, self.width, self.value)

    def get(self, key=None):
        return self.value

    def set(self, value):
        self.value = int(value)

    def fixed_width(self) -> int:
        return self.width

    def to_bitstream(self, obs, source: int) -> int:
        return obs.write_bits(self.value & ((1 << self.width) - 1), self.width)

    def from_bitstream(self, ibs, source: int) -> None:
        self.value = ibs.read_bits(self.width)

    def to_spec(self) -> str:
        return f"it.unimi.dsi.webgraph.labelling.FixedWidthIntLabel({self.key},{self.width})"


class FixedWidthIntListLabel(Label):
    """A list of fixed-width integers, length gamma-coded
    (reference FixedWidthIntListLabel.java:32)."""

    def __init__(self, key: str = "FOO", width: int = 32, value=None):
        self.key = key
        self.width = int(width)
        self.value = list(value) if value is not None else []

    def copy(self):
        return FixedWidthIntListLabel(self.key, self.width, list(self.value))

    def get(self, key=None):
        return self.value

    def set(self, value):
        self.value = list(value)

    def to_bitstream(self, obs, source: int) -> int:
        bits = obs.write_gamma(len(self.value))
        for v in self.value:
            bits += obs.write_bits(int(v) & ((1 << self.width) - 1), self.width)
        return bits

    def from_bitstream(self, ibs, source: int) -> None:
        length = ibs.read_gamma()
        self.value = [ibs.read_bits(self.width) for _ in range(length)]

    def to_spec(self) -> str:
        return f"it.unimi.dsi.webgraph.labelling.FixedWidthIntListLabel({self.key},{self.width})"


_LABEL_CLASSES = {
    "GammaCodedIntLabel": GammaCodedIntLabel,
    "FixedWidthIntLabel": FixedWidthIntLabel,
    "FixedWidthIntListLabel": FixedWidthIntListLabel,
}


def parse_label_spec(spec: str) -> Label:
    """Parse a constructor-spec string (reference ObjectParser convention)."""
    spec = spec.strip()
    name, _, argstr = spec.partition("(")
    short = name.rpartition(".")[2]
    if short not in _LABEL_CLASSES:
        raise ValueError(f"unknown label class {name!r}")
    args = [a.strip() for a in argstr.rstrip(")").split(",") if a.strip()]
    cls = _LABEL_CLASSES[short]
    if cls is GammaCodedIntLabel:
        return cls(*args[:1])
    key = args[0] if args else "FOO"
    width = int(args[1]) if len(args) > 1 else 32
    return cls(key, width)
