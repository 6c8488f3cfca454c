"""Library-wide logging (parity: mimic/logger/logger.py:19-76 — stderr INFO
+ rotating per-process DEBUG file, 10-file retention)."""

from __future__ import annotations

import logging
import logging.handlers
import os
from pathlib import Path
from typing import Optional

_LOG_DIR = Path(os.environ.get("MOPOE_LOG_DIR", Path.home() / ".mopoe_tpu" / "logs"))

log = logging.getLogger("mopoe_mimic_tpu")


def configure(debug_dir: Optional[Path] = None, level: int = logging.INFO) -> logging.Logger:
    if log.handlers:
        return log
    log.setLevel(logging.DEBUG)
    sh = logging.StreamHandler()
    sh.setLevel(level)
    sh.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
    log.addHandler(sh)
    try:
        d = Path(debug_dir or _LOG_DIR)
        d.mkdir(parents=True, exist_ok=True)
        fh = logging.handlers.RotatingFileHandler(
            d / f"mopoe_{os.getpid()}.log", maxBytes=2 ** 20, backupCount=10
        )
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
        )
        log.addHandler(fh)
    except OSError:
        pass  # read-only filesystem: stderr only
    return log


configure()
