"""Crawl/report configuration, mirroring the reference's layered config
(configargparse defaults ← config files ← STORCRAWL_* env ← CLI flags,
storcrawl.py:16-51).  We keep the same knob names and defaults."""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass
class CrawlConfig:
    dirs: list[str] = field(default_factory=list)
    tag: str = "crawl"
    owners: str | None = None
    # default exclusion matches the reference (storcrawl.py:39)
    exclude: list[str] = field(default_factory=lambda: [".snapshot"])
    extension_length: int = 6  # storcrawl.py:27
    walkers: int = 4  # storcrawl.py:41
    staters: int = 4
    injects: int = 4
    update_interval: float = 60.0  # storcrawl.py:45
    commit_timeout: float = 60.0  # storcrawl.py:46
    max_depth: int = 512  # loop safety bound; real trees are << this

    @classmethod
    def from_env(cls, **overrides) -> "CrawlConfig":
        cfg = cls(**overrides)
        env = os.environ
        if "STORCRAWL_EXTENSION_LENGTH" in env:
            cfg.extension_length = int(env["STORCRAWL_EXTENSION_LENGTH"])
        if "STORCRAWL_EXCLUDE" in env:
            cfg.exclude = env["STORCRAWL_EXCLUDE"].split(",")
        if "STORCRAWL_TAG" in env:
            cfg.tag = env["STORCRAWL_TAG"]
        if "STORCRAWL_OWNERS" in env:
            cfg.owners = env["STORCRAWL_OWNERS"]
        return cfg
