"""Env-driven engine settings with validation bounds.

The reference configures itself through pydantic ``BaseSettings``
(reference ``src/secbot/config.py:33-177``: env vars + optional .env
file, per-field ge/le bounds, toggle flags for each defense sink).
This is the stdlib twin: the same surface — ``NCS_*`` environment
variables, an optional ``.env`` file, bounds-checked ints, HH:MM cron
times, feature toggles (F7 config-gated execution) — without adding a
dependency the sandbox doesn't ship.

Field ↔ reference mapping:

====================  ===========================  =================
field                 reference env                bounds
====================  ===========================  =================
cron_times            SEC_BOT_CRON_TIME            HH:MM list
news_limit            SEC_BOT_NEWS_LIMIT           1..50
advisory_limit        SEC_BOT_ADVISORY_LIMIT       1..50
asec_post_limit       SEC_BOT_ASEC_LIMIT           1..20
enable_ipset          SEC_BOT_ENABLE_IPSET         bool
enable_suricata       SEC_BOT_ENABLE_SURICATA      bool
enable_suricata_url   SEC_BOT_ENABLE_SURICATA_URL  bool
enable_suricata_hash  SEC_BOT_ENABLE_SURICATA_HASH bool
====================  ===========================  =================

plus engine-side knobs the reference keeps as code constants:
``max_attempts`` (retry cap, 1..10), ``retry_jitter_span`` (rounds,
0..8), ``state_dir`` (checkpoint root), ``politeness_budget``
(per-host fetches/round, 1..100000).
"""

from __future__ import annotations

import dataclasses
import os
import re

ENV_PREFIX = "NCS_"

_INT_BOUNDS: dict[str, tuple[int, int]] = {
    "news_limit": (1, 50),
    "advisory_limit": (1, 50),
    "asec_post_limit": (1, 20),
    "max_attempts": (1, 10),
    "retry_jitter_span": (0, 8),
    "politeness_budget": (1, 100_000),
}

_BOOLS = {"enable_ipset", "enable_suricata", "enable_suricata_url",
          "enable_suricata_hash"}

_CRON_RE = re.compile(r"^([01]\d|2[0-3]):[0-5]\d$")


class SettingsError(ValueError):
    """A value failed validation (wrong type, out of bounds, bad HH:MM)."""


@dataclasses.dataclass(frozen=True)
class Settings:
    cron_times: tuple[str, ...] = ("06:00",)
    news_limit: int = 10
    advisory_limit: int = 10
    asec_post_limit: int = 5
    max_attempts: int = 3
    retry_jitter_span: int = 0
    politeness_budget: int = 5
    state_dir: str = ""
    enable_ipset: bool = True
    enable_suricata: bool = True
    enable_suricata_url: bool = True
    enable_suricata_hash: bool = True

    @classmethod
    def from_env(cls, env: dict[str, str] | None = None,
                 env_file: str | None = ".env") -> "Settings":
        """Build settings from ``NCS_<FIELD>`` variables; process env
        wins over the .env file wins over defaults (pydantic's
        precedence)."""
        merged: dict[str, str] = {}
        if env_file and os.path.isfile(env_file):
            merged.update(_parse_env_file(env_file))
        merged.update(env if env is not None else os.environ)

        kwargs = {}
        for f in dataclasses.fields(cls):
            raw = merged.get(ENV_PREFIX + f.name.upper())
            if raw is None:
                continue
            kwargs[f.name] = _coerce(f.name, raw)
        return cls(**kwargs)

    def __post_init__(self):
        for name, (lo, hi) in _INT_BOUNDS.items():
            v = getattr(self, name)
            if not isinstance(v, int) or isinstance(v, bool) or not lo <= v <= hi:
                raise SettingsError(f"{name}={v!r} outside [{lo}, {hi}]")
        for t in self.cron_times:
            if not _CRON_RE.match(t):
                raise SettingsError(f"cron_times entry {t!r} is not HH:MM")


def _parse_env_file(path: str) -> dict[str, str]:
    out: dict[str, str] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            k, _, v = line.partition("=")
            out[k.strip()] = v.strip().strip("'\"")
    return out


def _coerce(name: str, raw: str):
    if name == "cron_times":
        return tuple(t.strip() for t in raw.split(",") if t.strip())
    if name in _BOOLS:
        low = raw.strip().lower()
        if low in ("1", "true", "yes", "on"):
            return True
        if low in ("0", "false", "no", "off"):
            return False
        raise SettingsError(f"{name}={raw!r} is not a boolean")
    if name in _INT_BOUNDS:
        try:
            return int(raw)
        except ValueError as e:
            raise SettingsError(f"{name}={raw!r} is not an int") from e
    return raw
