"""Loguru-style logging facade over the stdlib.

The reference uses ``loguru`` throughout (reference ``tools/run_pipeline.py:32-37``,
``config/logging.yaml``).  loguru is not available in this environment, so this
module provides the same ergonomic surface -- ``logger.info/debug/warning/error``,
``logger.add(sink, level=..., rotation=...)``, ``logger.remove()`` -- implemented
on ``logging``, with colored console output and size-based file rotation.
"""

from __future__ import annotations

import logging
import logging.handlers
import os
import re
import sys
from typing import Any

_LEVEL_COLORS = {
    "DEBUG": "\x1b[36m",
    "INFO": "\x1b[32m",
    "WARNING": "\x1b[33m",
    "ERROR": "\x1b[31m",
    "CRITICAL": "\x1b[35m",
}
_RESET = "\x1b[0m"

_SIZE_RE = re.compile(r"^\s*([\d.]+)\s*(KB|MB|GB|B)?\s*$", re.IGNORECASE)


def _parse_rotation(rotation: str | int | None) -> int:
    """Parse loguru-style rotation sizes like ``"50 MB"`` into bytes."""
    if rotation is None:
        return 0
    if isinstance(rotation, (int, float)):
        return int(rotation)
    m = _SIZE_RE.match(str(rotation))
    if not m:
        return 0
    value = float(m.group(1))
    unit = (m.group(2) or "B").upper()
    mult = {"B": 1, "KB": 1024, "MB": 1024**2, "GB": 1024**3}[unit]
    return int(value * mult)


class _ColorFormatter(logging.Formatter):
    def __init__(self, use_color: bool = True) -> None:
        super().__init__()
        self.use_color = use_color

    def format(self, record: logging.LogRecord) -> str:
        ts = self.formatTime(record, "%Y-%m-%d %H:%M:%S")
        level = record.levelname
        msg = record.getMessage()
        if record.exc_info:
            msg += "\n" + self.formatException(record.exc_info)
        if self.use_color:
            c = _LEVEL_COLORS.get(level, "")
            return f"{ts} | {c}{level:<8}{_RESET} | {msg}"
        return f"{ts} | {level:<8} | {msg}"


class _Logger:
    """Minimal loguru-compatible logger singleton."""

    def __init__(self) -> None:
        self._logger = logging.getLogger("rtmodt")
        self._logger.setLevel(logging.DEBUG)
        self._logger.propagate = False
        self._handler_ids: dict[int, logging.Handler] = {}
        self._next_id = 0
        # Default console sink, like loguru's default stderr sink.
        self.add(sys.stderr, level=os.environ.get("RTMODT_LOG_LEVEL", "INFO"))

    def add(
        self,
        sink: Any,
        level: str = "DEBUG",
        rotation: str | int | None = None,
        retention: Any = None,  # accepted for loguru compat; unused
        compression: Any = None,  # accepted for loguru compat; unused
        serialize: bool = False,
        colorize: bool | None = None,
        format: str | None = None,  # noqa: A002 - loguru compat
        **_: Any,
    ) -> int:
        handler: logging.Handler
        if hasattr(sink, "write"):
            handler = logging.StreamHandler(sink)
            use_color = colorize if colorize is not None else getattr(sink, "isatty", lambda: False)()
            handler.setFormatter(_ColorFormatter(use_color=use_color))
        else:
            path = str(sink)
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            max_bytes = _parse_rotation(rotation)
            if max_bytes > 0:
                handler = logging.handlers.RotatingFileHandler(path, maxBytes=max_bytes, backupCount=5)
            else:
                handler = logging.FileHandler(path)
            handler.setFormatter(_ColorFormatter(use_color=False))
        handler.setLevel(getattr(logging, str(level).upper(), logging.DEBUG))
        self._logger.addHandler(handler)
        hid = self._next_id
        self._next_id += 1
        self._handler_ids[hid] = handler
        return hid

    def remove(self, handler_id: int | None = None) -> None:
        if handler_id is None:
            for h in list(self._handler_ids.values()):
                self._logger.removeHandler(h)
            self._handler_ids.clear()
        elif handler_id in self._handler_ids:
            self._logger.removeHandler(self._handler_ids.pop(handler_id))

    def _log(self, level: int, message: Any, *args: Any, **kwargs: Any) -> None:
        if args or kwargs:
            try:
                message = str(message).format(*args, **kwargs)
            except (IndexError, KeyError, ValueError):
                # a malformed format spec must never crash the call site
                pass
        self._logger.log(level, message)

    def debug(self, message: Any, *a: Any, **k: Any) -> None:
        self._log(logging.DEBUG, message, *a, **k)

    def info(self, message: Any, *a: Any, **k: Any) -> None:
        self._log(logging.INFO, message, *a, **k)

    def warning(self, message: Any, *a: Any, **k: Any) -> None:
        self._log(logging.WARNING, message, *a, **k)

    def error(self, message: Any, *a: Any, **k: Any) -> None:
        self._log(logging.ERROR, message, *a, **k)

    def critical(self, message: Any, *a: Any, **k: Any) -> None:
        self._log(logging.CRITICAL, message, *a, **k)

    def exception(self, message: Any, *a: Any, **k: Any) -> None:
        self._logger.log(logging.ERROR, str(message), exc_info=True)

    def success(self, message: Any, *a: Any, **k: Any) -> None:  # loguru compat
        self._log(logging.INFO, message, *a, **k)


logger = _Logger()


def configure_from_yaml(path: str) -> None:
    """Apply a declarative logging config (config/logging.yaml schema).

    The reference SHIPS such a file but never loads it (SURVEY.md 5.5);
    here it actually works.
    """
    import json
    import logging as _logging

    import yaml

    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    logger.remove()
    con = cfg.get("console", {})
    if con.get("enabled", True):
        logger.add(sys.stderr, level=con.get("level", "INFO"),
                   colorize=con.get("colorize"))
    fl = cfg.get("file", {})
    if fl.get("enabled"):
        logger.add(fl.get("path", "logs/rtmodt.log"),
                   level=fl.get("level", "DEBUG"),
                   rotation=fl.get("rotation"))
    js = cfg.get("jsonl", {})
    if js.get("enabled"):
        hid = logger.add(js.get("path", "logs/rtmodt.jsonl"),
                         level=js.get("level", "INFO"))

        class _JsonFormatter(_logging.Formatter):
            def format(self, record: _logging.LogRecord) -> str:
                return json.dumps({
                    "time": self.formatTime(record),
                    "level": record.levelname,
                    "message": record.getMessage(),
                })

        logger._handler_ids[hid].setFormatter(_JsonFormatter())
