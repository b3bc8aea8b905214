"""Runtime config: TOML -> typed objects + vector-class registry.

Parity target: ``configgen.py:132-155`` (``load_config``/``load_config_str``
building a section->object tree with a dynamic fallback for unknown
sections) and ``configgen.py:122-127`` (``vector_classes_map`` keyed by
``label``). The reference's ``cfg.toml`` mixes ``class`` and
``weaviate_class`` keys across entries (cfg.toml:29,35) — the loader
accepts either. ``top_by_certainty`` (cfg.toml:48) becomes the certainty
threshold fed to the similarity operator; ``properties`` drives the sink's
``ensure_class`` schema.

stdlib ``tomllib`` only — config loading is a driver-side concern, never a
data-plane op.
"""

from __future__ import annotations

import tomllib
from dataclasses import dataclass, field
from typing import Any


@dataclass
class VectorClassConfig:
    """One queryable vector class (cfg.toml:28-55 entry shape)."""

    label: str
    class_name: str
    properties: list[str] = field(default_factory=list)
    as_context: bool = True
    url_property: str | None = None
    top_by_certainty: float | None = None

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "VectorClassConfig":
        name = d.get("class") or d.get("weaviate_class")
        if not d.get("label") or not name:
            raise ValueError(f"vector class needs label and class: {d}")
        return cls(
            label=d["label"],
            class_name=name,
            properties=list(d.get("properties", [])),
            as_context=bool(d.get("as_context", True)),
            url_property=d.get("url_property"),
            top_by_certainty=d.get("top_by_certainty"),
        )

    def sink_properties(self) -> list[dict[str, Any]]:
        """Schema payload for the sink's ensure_class (cmfunctions.py:80-90
        creates string-typed properties)."""
        return [{"name": p, "dataType": ["text"]} for p in self.properties]


class Section:
    """A config section: TOML keys become attributes (configgen.py:96-102
    behavior) without the reference's mutable-class-attribute pitfalls."""

    def __init__(self, values: dict[str, Any]):
        self._values = dict(values)
        for k, v in values.items():
            setattr(self, k, v)

    def get(self, key: str, default: Any = None) -> Any:
        return self._values.get(key, default)

    def to_dict(self) -> dict[str, Any]:
        return dict(self._values)


class QuerySection(Section):
    """query_config: adds the label-keyed vector-class registry
    (configgen.py:122-127)."""

    def __init__(self, values: dict[str, Any]):
        super().__init__(values)
        classes = [
            VectorClassConfig.from_dict(d) for d in values.get("vector_classes", [])
        ]
        self.vector_classes = classes
        self.vector_classes_map = {c.label: c for c in classes}


@dataclass
class EngineConfig:
    """Top-level config tree; unknown sections land in ``extras`` (the
    reference maps unknown sections to BaseConfig — configgen.py:145-148)."""

    sections: dict[str, Section] = field(default_factory=dict)

    def __getattr__(self, name: str) -> Section:
        try:
            return self.__dict__["sections"][name]
        except KeyError:
            raise AttributeError(name) from None

    @property
    def query_config(self) -> QuerySection | None:
        return self.sections.get("query_config")  # type: ignore[return-value]

    def vector_class(self, label: str) -> VectorClassConfig:
        qc = self.query_config
        if qc is None or label not in qc.vector_classes_map:
            raise KeyError(label)
        return qc.vector_classes_map[label]


def load_config_str(config_str: str) -> EngineConfig:
    raw = tomllib.loads(config_str)
    sections: dict[str, Section] = {}
    for name, values in raw.items():
        if not isinstance(values, dict):
            values = {"value": values}
        cls = QuerySection if name == "query_config" else Section
        sections[name] = cls(values)
    return EngineConfig(sections=sections)


def load_config(path: str) -> EngineConfig:
    with open(path, "rb") as f:
        return load_config_str(f.read().decode("utf-8"))
