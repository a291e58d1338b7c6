"""Logging (reference utils/logger.py:9-33): stdout + <exp_dir>/log.txt,
with a process-0 gate for multi-host runs."""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional


def is_master_process() -> bool:
    """Process-0 gate (reference utils/distributed.py:10-17)."""
    import jax

    return jax.process_index() == 0


def setup_default_logging(output_dir: Optional[str] = None,
                          level=logging.INFO, name: str = "cotnet_tpu"):
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.handlers.clear()
    fmt = logging.Formatter(
        "%(asctime)s %(levelname)s %(name)s: %(message)s", "%H:%M:%S")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if output_dir and is_master_process():
        os.makedirs(output_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(output_dir, "log.txt"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.propagate = False
    return logger


def logger_info(logger, msg: str):
    """Master-only info (reference logger.py:30-33)."""
    if is_master_process():
        logger.info(msg)
