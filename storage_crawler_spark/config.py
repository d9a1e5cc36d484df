"""Crawl/report configuration, mirroring the reference's layered config
(configargparse defaults ← config files ← STORCRAWL_* env ← CLI flags,
storcrawl.py:16-51).  We keep the same knob names and defaults.

Layering order (lowest to highest precedence), matching configargparse:

1. dataclass defaults;
2. site config files ``/etc/storcrawlrc``, ``~/storcrawlrc``,
   ``~/.storcrawlrc`` (later files override earlier ones), plus an explicit
   file named by ``STORCRAWL_CONFIG_FILE`` (overrides the default files);
3. ``STORCRAWL_*`` environment variables;
4. explicit keyword overrides (the CLI-flag analog).

File format is configargparse's: ``key = value`` (or ``key: value``) lines,
``#``/``;`` comments; keys use the long option names (``-`` or ``_``
spelled); the [+]-style list options ``dir`` and ``exclude`` accept either a
``[a, b]`` list literal, a comma-separated string, or repeated keys
(accumulating in file order).
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field

# The reference's default_config_files (storcrawl.py:16).
CONFIG_FILES = ("/etc/storcrawlrc", "~/storcrawlrc", "~/.storcrawlrc")

# file/env option name → (config field, parser)
_LIST_KEYS = {"dir": "dirs", "exclude": "exclude"}
_SCALAR_KEYS = {
    "tag": ("tag", str),
    "owners": ("owners", str),
    "extension_length": ("extension_length", int),
    "walkers": ("walkers", int),
    "staters": ("staters", int),
    "injects": ("injects", int),
    "update": ("update_interval", float),
    "timeout": ("commit_timeout", float),
}


def _split_list(value: str) -> list[str]:
    v = value.strip()
    if v.startswith("[") and v.endswith("]"):
        v = v[1:-1]
    return [p.strip() for p in v.split(",") if p.strip()]


def parse_rc(text: str) -> dict[str, object]:
    """Parse one rc file's text into {field: value} (unknown keys ignored —
    the reference's db* and log* options have no analog here)."""
    out: dict[str, object] = {}
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line[0] in "#;":
            continue
        if "=" in line:
            key, _, value = line.partition("=")
        elif ":" in line:
            key, _, value = line.partition(":")
        else:
            continue
        key = key.strip().lower().replace("-", "_")
        value = value.strip()
        if key in _LIST_KEYS:
            fieldname = _LIST_KEYS[key]
            prev = out.get(fieldname)
            items = _split_list(value)
            out[fieldname] = (prev + items) if isinstance(prev, list) else items
        elif key in _SCALAR_KEYS:
            fieldname, cast = _SCALAR_KEYS[key]
            out[fieldname] = cast(value)
    return out


def _layered_file_values(env: dict[str, str]) -> dict[str, object]:
    merged: dict[str, object] = {}
    paths = [os.path.expanduser(p) for p in CONFIG_FILES]
    explicit = env.get("STORCRAWL_CONFIG_FILE")
    if explicit:
        paths.append(os.path.expanduser(explicit))
    for path in paths:
        try:
            with open(path, "r", encoding="utf-8") as fh:
                merged.update(parse_rc(fh.read()))
        except OSError:
            continue
    return merged


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
    # Loop safety bound against pathological nesting (bind-mount loops;
    # symlinks are never followed).  Raised from 512 in r14: deep-chain
    # frontiers batch ~deep_batch_levels levels per Spark job, so even the
    # bound's worst case is ~2*max_depth/deep_batch_levels driver jobs,
    # and the OS itself walls absolute paths at PATH_MAX (~4096 bytes,
    # ~2000 levels of 1-char names) long before this bound.
    max_depth: int = 65536
    # In-task descent for chain-shaped frontiers (r14): when a frontier
    # holds fewer dirs than the parallelism, each task walks up to
    # deep_batch_levels levels locally (capped at deep_dir_budget adopted
    # dirs) instead of paying a driver round-trip per level.  1 disables.
    # 256 (up from the initial 64): the per-batch driver cost is ~1.6 s
    # (checkpoint + frontier count + Python-worker spin-up), so a
    # PATH_MAX-deep chain (~2048 levels) pays 8 round-trips instead of
    # 32; the worst case a wider budget adds is deep_dir_budget SERIAL
    # scandir calls inside one task — work that had no parallelism to
    # lose (one dir per level) and costs ~µs per call.
    deep_batch_levels: int = 256
    deep_dir_budget: int = 256
    # Rotating-file crawl log (the reference derives logfile from the tag,
    # storcrawl.py:60; here it is opt-in).  None disables file logging.
    logfile: str | None = None
    # When set, the crawl spills each frontier level (and the final files
    # materialization) to parquet under this directory and re-reads it,
    # instead of localCheckpoint: checkpoint blocks pin executor storage and
    # die with the executor, while lake levels survive and free the heap —
    # the right mode for metadata trees too big for cluster memory.  Spark
    # knob, no reference analog.
    level_store: str | None = None

    @classmethod
    def from_env(cls, **overrides) -> "CrawlConfig":
        """defaults ← rc files ← STORCRAWL_* env ← explicit kwargs."""
        env = dict(os.environ)
        cfg = cls()
        for fieldname, value in _layered_file_values(env).items():
            setattr(cfg, fieldname, value)
        if "STORCRAWL_EXTENSION_LENGTH" in env:
            cfg.extension_length = int(env["STORCRAWL_EXTENSION_LENGTH"])
        if "STORCRAWL_EXCLUDE" in env:
            cfg.exclude = _split_list(env["STORCRAWL_EXCLUDE"])
        if "STORCRAWL_DIR" in env:
            cfg.dirs = _split_list(env["STORCRAWL_DIR"])
        if "STORCRAWL_TAG" in env:
            cfg.tag = env["STORCRAWL_TAG"]
        if "STORCRAWL_OWNERS" in env:
            cfg.owners = env["STORCRAWL_OWNERS"]
        if "STORCRAWL_WALKERS" in env:
            cfg.walkers = int(env["STORCRAWL_WALKERS"])
        if "STORCRAWL_STATERS" in env:
            cfg.staters = int(env["STORCRAWL_STATERS"])
        if "STORCRAWL_INJECTS" in env:
            cfg.injects = int(env["STORCRAWL_INJECTS"])
        if "STORCRAWL_UPDATE" in env:
            cfg.update_interval = float(env["STORCRAWL_UPDATE"])
        if "STORCRAWL_TIMEOUT" in env:
            cfg.commit_timeout = float(env["STORCRAWL_TIMEOUT"])
        if "STORCRAWL_LEVEL_STORE" in env:
            cfg.level_store = env["STORCRAWL_LEVEL_STORE"]
        if "STORCRAWL_LOGFILE" in env:
            cfg.logfile = env["STORCRAWL_LOGFILE"]
        # Reject unknown kwargs the way cls(**overrides) would: a typo like
        # logfil=... must not silently grow a dead attribute.
        valid = {f.name for f in dataclasses.fields(cls)}
        for key, value in overrides.items():
            if key not in valid:
                raise TypeError(
                    f"CrawlConfig.from_env() got an unexpected keyword argument {key!r}"
                )
            setattr(cfg, key, value)
        return cfg
