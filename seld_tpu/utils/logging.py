"""Timestamped file+stdout logging (parity with ref utils.py:8-42)."""

from __future__ import annotations

import logging
import os
import sys
from datetime import datetime

LOGGER_NAME = "seld_tpu"


def get_logger() -> logging.Logger:
    return logging.getLogger(LOGGER_NAME)


def setup_logging(log_dir: str = "logs", experiment_name: str = "seld_tpu"):
    """Create the framework logger with a timestamped file handler and a
    stdout handler. Clears existing handlers so repeated setup (notebooks,
    tests) doesn't duplicate output — same behavior as the reference
    (ref: utils.py:19-21).

    Returns (logger, log_file_path).
    """
    os.makedirs(log_dir, exist_ok=True)
    timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    log_file = os.path.join(log_dir, f"{experiment_name}_{timestamp}.log")

    logger = logging.getLogger(LOGGER_NAME)
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    logger.propagate = False  # avoid duplicate lines via the root logger

    formatter = logging.Formatter(
        "%(asctime)s - %(name)s - %(levelname)s - %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
    )
    fh = logging.FileHandler(log_file)
    fh.setLevel(logging.INFO)
    fh.setFormatter(formatter)
    ch = logging.StreamHandler(sys.stdout)
    ch.setLevel(logging.INFO)
    ch.setFormatter(formatter)
    logger.addHandler(fh)
    logger.addHandler(ch)
    return logger, log_file
