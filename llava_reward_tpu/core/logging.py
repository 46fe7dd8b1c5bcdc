"""Stdout logger with aligned continuation lines (the reference vendors
vLLM's logger, llava_reward/utils/logging.py:11-56 — same surface, fresh
implementation)."""

from __future__ import annotations

import logging
import sys

_FORMAT = "%(levelname)s %(asctime)s %(filename)s:%(lineno)d] %(message)s"
_DATE = "%m-%d %H:%M:%S"


class AlignedFormatter(logging.Formatter):
    """Indent continuation lines to the message column."""

    def format(self, record):
        msg = logging.Formatter.format(self, record)
        if record.message and "\n" in record.message:
            header = msg.split(record.message)[0]
            msg = msg.replace("\n", "\n" + " " * len(header))
        return msg


_root_configured = False


def init_logger(name: str) -> logging.Logger:
    global _root_configured
    logger = logging.getLogger(name)
    if not _root_configured:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(AlignedFormatter(_FORMAT, _DATE))
        base = logging.getLogger("llava_reward_tpu")
        base.addHandler(handler)
        base.setLevel(logging.INFO)
        base.propagate = False
        _root_configured = True
    return logger
