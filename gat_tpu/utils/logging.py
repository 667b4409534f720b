"""Structured logging with the reference's `[function]`-tag convention.

The reference logs via bare print() with `[function_name]` prefixes
(SURVEY §5.5); this keeps that exact console format while routing through
the stdlib logging stack (so levels/handlers/files work) and adds a
metrics emitter that renders one flat `key=value` line per step —
greppable and machine-parsable.
"""
from __future__ import annotations

import logging
import sys

__all__ = ["get_logger", "tag_print", "log_metrics"]

_FORMAT = "%(message)s"


def get_logger(name: str = "gat_tpu", level: int = logging.INFO
               ) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stdout)
        h.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(h)
        logger.setLevel(level)
        logger.propagate = False
    return logger


def tag_print(tag: str, *parts, logger: logging.Logger | None = None):
    """`[tag] message` — the reference's console convention."""
    msg = f"[{tag}] " + " ".join(str(p) for p in parts)
    (logger or get_logger()).info(msg)


def log_metrics(step: int | str, logger: logging.Logger | None = None,
                **metrics):
    """One flat metrics line: `step=3 loss=0.1234 acc=0.9876`."""
    body = " ".join(f"{k}={v:.6g}" if isinstance(v, float) else f"{k}={v}"
                    for k, v in metrics.items())
    (logger or get_logger()).info(f"step={step} {body}")
