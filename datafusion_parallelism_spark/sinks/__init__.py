"""Result sinks (CSV / JSON / noop) — the reference's output surface."""

from .files import write_csv, write_json  # noqa: F401
