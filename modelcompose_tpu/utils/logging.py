"""Logging utilities (reference: modelcompose/utils.py:17-92 build_logger):
stdout + rotating file handler under LOGDIR."""

from __future__ import annotations

import logging
import logging.handlers
import os
import sys

from ..constants import LOGDIR

_handler = None


def build_logger(logger_name: str, logger_filename: str) -> logging.Logger:
    global _handler
    formatter = logging.Formatter(
        fmt="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S")

    root = logging.getLogger()
    if not root.handlers:
        stdout = logging.StreamHandler(sys.stdout)
        stdout.setFormatter(formatter)
        root.addHandler(stdout)
        root.setLevel(logging.INFO)

    logger = logging.getLogger(logger_name)
    logger.setLevel(logging.INFO)

    if _handler is None:
        os.makedirs(LOGDIR, exist_ok=True)
        filename = os.path.join(LOGDIR, logger_filename)
        _handler = logging.handlers.TimedRotatingFileHandler(
            filename, when="D", utc=True)
        _handler.setFormatter(formatter)
    if _handler not in logger.handlers:
        logger.addHandler(_handler)
    return logger


def disable_torch_init() -> None:
    """No-op in the JAX rebuild (reference: modelcompose/utils.py uses it to
    skip redundant torch init); kept for CLI-surface compatibility."""


def pretty_print_semaphore(sem) -> str:
    if sem is None:
        return "None"
    return (f"Semaphore(value={sem._value}, "
            f"locked={sem.locked()})")


def violates_moderation(text: str) -> bool:
    """OpenAI moderation check for the web UI (reference:
    modelcompose/utils.py:102-121); fails open (False) on any error or when
    no API key is configured — e.g. zero-egress deployments."""
    import json as _json
    import os as _os

    import requests

    api_key = _os.environ.get("OPENAI_API_KEY")
    if not api_key:
        return False
    url = "https://api.openai.com/v1/moderations"
    headers = {"Content-Type": "application/json",
               "Authorization": "Bearer " + api_key}
    data = _json.dumps({"input": text.replace("\n", "")}).encode("utf-8")
    try:
        ret = requests.post(url, headers=headers, data=data, timeout=5)
        return bool(ret.json()["results"][0]["flagged"])
    except (requests.exceptions.RequestException, KeyError, ValueError):
        return False
