"""Hierarchical scoped configuration.

Re-expresses ``core/config/ScopedConfig.java:80-107``: a key resolves
through, in priority order,

    programmatic overrides (the System-property analog)
    -> process environment
    -> a ``.env`` file
    -> ``streamforge.json[<active job>]``
    -> ``streamforge.json[common]``

``activate_job`` (ScopedConfig.java:35-38) selects which job section
participates. All layers are plain string->string maps; values are
returned as strings, like the reference.
"""

from __future__ import annotations

import json
import os
import pathlib


def _parse_dotenv(path: str | os.PathLike) -> dict[str, str]:
    out: dict[str, str] = {}
    p = pathlib.Path(path)
    if not p.is_file():
        return out
    for line in p.read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        k, _, v = line.partition("=")
        out[k.strip()] = v.strip().strip("'\"")
    return out


class ScopedConfig:
    COMMON = "common"

    def __init__(self, config_file: str | None = "streamforge.json",
                 env_file: str | None = ".env",
                 overrides: dict[str, str] | None = None,
                 environ: dict[str, str] | None = None) -> None:
        self._overrides = dict(overrides or {})
        self._environ = os.environ if environ is None else environ
        self._dotenv = _parse_dotenv(env_file) if env_file else {}
        self._file: dict[str, dict[str, str]] = {}
        if config_file and pathlib.Path(config_file).is_file():
            self._file = json.loads(pathlib.Path(config_file).read_text())
        self._job: str | None = None

    def activate_job(self, name: str) -> None:
        self._job = name

    @property
    def active_job(self) -> str | None:
        return self._job

    def set(self, key: str, value: str) -> None:
        """Programmatic override (highest priority)."""
        self._overrides[key] = str(value)

    def get(self, key: str, default: str | None = None) -> str | None:
        for layer in (self._overrides, self._environ, self._dotenv):
            if key in layer:
                return layer[key]
        if self._job and key in self._file.get(self._job, {}):
            return str(self._file[self._job][key])
        if key in self._file.get(self.COMMON, {}):
            return str(self._file[self.COMMON][key])
        return default

    def exists(self, key: str) -> bool:
        return self.get(key) is not None

    def require(self, key: str) -> str:
        v = self.get(key)
        if v is None:
            job = self._job or "<no job>"
            raise KeyError(f"missing required config {key!r} (job {job})")
        return v
