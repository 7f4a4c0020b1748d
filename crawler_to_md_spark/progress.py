"""Logging / progress surface (reference log_setup.py + the tqdm counters
at scraper.py:421-426, 589-595).

The engine's durable progress record is the metrics table (one row per
wave — O10); this module is the *user-facing* mirror: a namespaced logger
with idempotent handler setup (reference tests/test_log_setup.py:35-53)
and a per-wave progress line using the same counters the reference fed
tqdm (total = A1 link count, done = A2 visited count).
"""

from __future__ import annotations

import logging
import sys

LOGGER_NAME = "crawler_to_md_spark"
_HANDLER_FLAG = "_cms_handler"


def get_logger() -> logging.Logger:
    return logging.getLogger(LOGGER_NAME)


def setup_logging(level: int = logging.INFO, stream=None) -> logging.Logger:
    """Idempotent: repeated calls never stack handlers (the reference
    guards the same way — log_setup.py)."""
    logger = get_logger()
    logger.setLevel(level)
    for h in logger.handlers:
        if getattr(h, _HANDLER_FLAG, False):
            h.setLevel(level)
            if stream is not None:
                h.setStream(stream)
            return logger
    handler = logging.StreamHandler(stream or sys.stderr)
    handler.setLevel(level)
    handler.setFormatter(
        logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
    )
    setattr(handler, _HANDLER_FLAG, True)
    logger.addHandler(handler)
    logger.propagate = False
    return logger


def wave_progress(wave_id: int, dequeued: int, inserted: int,
                  visited: int, total: int) -> str:
    """One progress line per wave: done/total mirrors the reference's
    tqdm bar (total grows as inserts land, scraper.py:589-595)."""
    pct = (100.0 * visited / total) if total else 100.0
    return (f"wave {wave_id}: dequeued={dequeued} discovered_new={inserted} "
            f"visited={visited}/{total} ({pct:.1f}%)")
