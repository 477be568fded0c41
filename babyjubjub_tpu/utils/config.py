"""Framework configuration (SURVEY.md section 5.6 parity).

The reference's only configuration is two cargo features selecting the
BLAKE backend (/root/reference/Cargo.toml:40-42). Here the equivalent
surface is environment-driven with programmatic overrides:

  BJJ_BACKEND        auto|cpu|tpu   pallas kernel routing ("auto" = use
                                    kernels on any accelerator backend)
  BJJ_TILE           int            pallas lane tile (default 512)
  BJJ_BLAKE          auto|native|py BLAKE-512 backend selection
  BJJ_WINDOW         int            scalar-mul window bits (default 4)
"""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass
class Config:
    backend: str = os.environ.get("BJJ_BACKEND", "auto")
    tile: int = int(os.environ.get("BJJ_TILE", "512"))
    blake: str = os.environ.get("BJJ_BLAKE", "auto")
    window: int = int(os.environ.get("BJJ_WINDOW", "4"))


CONFIG = Config()


def apply():
    """Push the config into the op modules."""
    from ..ops import field as F
    if CONFIG.backend == "cpu":
        F.set_pallas("off")
    elif CONFIG.backend == "tpu":
        F.set_pallas("on")
    else:
        F.set_pallas("auto")
    F._PALLAS_TILE = CONFIG.tile


apply()
