"""F2/F3 — sink registry, dynamic dispatch, and feature gating.

The reference resolves sinks by model name by scanning
``ModelBaseSink.__subclasses__`` (``base_sink.py:360-369``) or dynamic
``import_module`` (``tasks.py:55-59``), and gates each sink behind a
settings flag OR a waffle flag (``base_sink.py:337-358``). Here both
collapse to an explicit registry dict + a settings mapping — no Django, no
import-time magic, same capabilities.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass
class SinkSpec:
    """Declarative sink description (the reference's class attributes
    ``model`` / ``unique_key`` / ``clickhouse_table_name`` /
    ``timestamp_field`` / ``serializer_class`` / ``nested_sinks``,
    ``base_sink.py:82-131``)."""

    model: str
    unique_key: str
    table_name: str
    timestamp_field: str
    name: str
    serializer: Callable | None = None          # DataFrame -> DataFrame
    nested: list["SinkSpec"] = field(default_factory=list)


class SinkRegistry:
    """Model-name → sink spec registry with enable/disable gating."""

    def __init__(self, settings: dict | None = None):
        self._specs: dict[str, SinkSpec] = {}
        # settings e.g. {"EVENT_SINK_CLICKHOUSE_COURSE_OVERVIEWS_ENABLED": True}
        self.settings = dict(settings or {})

    def register(self, spec: SinkSpec) -> SinkSpec:
        self._specs[spec.model] = spec
        return spec

    def get_by_model_name(self, model: str) -> SinkSpec | None:
        """F2 — ``get_sink_by_model_name`` (``base_sink.py:360-369``);
        unknown model → None, exactly like the reference."""
        return self._specs.get(model)

    def is_enabled(self, model: str) -> bool:
        """F3 — settings flag OR dynamic flag (``base_sink.py:337-358``).
        The waffle flag becomes a plain runtime-settable boolean under the
        same naming scheme; default False, like the reference."""
        static = bool(self.settings.get(
            f"EVENT_SINK_CLICKHOUSE_{model.upper()}_ENABLED", False))
        dynamic = bool(self.settings.get(
            f"event_sink_clickhouse.{model}.enabled", False))
        return static or dynamic

    def enabled_models(self) -> list[str]:
        return [m for m in self._specs if self.is_enabled(m)]
