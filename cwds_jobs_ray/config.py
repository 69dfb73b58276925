"""YAML job configuration with environment substitution and validation.

The reference configures every job from a YAML file passed as ``-c``:
parsed into a typed configuration object
(/root/reference/jobs-common/src/main/java/gov/ca/cwds/jobs/common/configuration/JobConfiguration.java:27-48)
after ``EnvironmentVariableSubstitutor`` expansion, with CLI option parsing
in JobOptions (/root/reference/jobs-common/src/main/java/gov/ca/cwds/jobs/common/configuration/JobOptions.java:132-165).
Same model here: ``${VAR}`` / ``${VAR:-default}`` in any string value is
substituted from the process environment, keys are validated against the
known schema, and the result feeds ``CDCJob`` kwargs.
"""

from __future__ import annotations

import os
import re
from typing import Any

_SUBST = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)(?::-([^}]*))?\}")

# key -> (type, required). Mirrors CDCJob's constructor plus run options.
SCHEMA: dict[str, tuple[type, bool]] = {
    "table_dir": (str, True),
    "wal_dir": (str, False),
    # multi-source CDC: {source_name: wal_dir} (composite savepoints);
    # exactly one of wal_dir / wal_sources is required
    "wal_sources": (dict, False),
    "base_path": (str, False),
    "num_partitions": (int, False),
    "events_per_batch": (int, False),
    "combine_batch_size": (int, False),
    "slice_group_size": (int, False),
    "merge_policy": (str, False),
    "delta_threshold": (float, False),
    "max_delta_files": (int, False),
    "follow": (dict, False),
}

FOLLOW_SCHEMA: dict[str, tuple[type, bool]] = {
    # follow mode is entered ONLY on an explicit opt-in: the --follow flag
    # or `follow.enabled: true`. A follow: section holding just tuning knobs
    # must not force tail mode (one-shot runs stay possible).
    "enabled": (bool, False),
    "poll_interval_s": (float, False),
    "idle_polls_to_stop": (int, False),
    "max_polls": (int, False),
}

JOB_KEYS = ("num_partitions", "events_per_batch", "combine_batch_size",
            "slice_group_size", "merge_policy", "delta_threshold",
            "max_delta_files")


class ConfigError(ValueError):
    pass


def _substitute(value: Any) -> Any:
    if isinstance(value, str):
        def repl(m: re.Match) -> str:
            var, default = m.group(1), m.group(2)
            if var in os.environ:
                return os.environ[var]
            if default is not None:
                return default
            raise ConfigError(
                f"environment variable {var!r} referenced in config is unset "
                "and has no ${VAR:-default}")
        return _SUBST.sub(repl, value)
    if isinstance(value, dict):
        return {k: _substitute(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_substitute(v) for v in value]
    return value


def _validate(raw: dict, schema: dict[str, tuple[type, bool]],
              where: str) -> dict:
    out: dict[str, Any] = {}
    for key, val in raw.items():
        if key not in schema:
            raise ConfigError(f"unknown config key {where}{key!r} "
                              f"(known: {sorted(schema)})")
        typ = schema[key][0]
        if val is None:
            continue
        if typ in (int, float) and isinstance(val, str):
            try:
                val = typ(val)  # env substitution yields strings
            except ValueError as e:
                raise ConfigError(f"{where}{key}: {e}") from e
        if typ is float and isinstance(val, int):
            val = float(val)
        if not isinstance(val, typ):
            raise ConfigError(
                f"{where}{key}: expected {typ.__name__}, got "
                f"{type(val).__name__} ({val!r})")
        out[key] = val
    for key, (_typ, required) in schema.items():
        if required and key not in out:
            raise ConfigError(f"missing required config key {where}{key!r}")
    return out


def load_config(path: str, overrides: dict | None = None) -> dict:
    """Parse + env-substitute + validate a job config file.

    ``overrides`` (CLI flags, None values ignored) merge into the raw config
    BEFORE validation, so the documented flags-override-config precedence
    holds for every check — including the wal_dir/wal_sources exclusivity
    rule (an explicit --wal-dir replaces a config's wal_sources outright
    rather than tripping the exactly-one check).
    """
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f)
    if not isinstance(raw, dict):
        raise ConfigError(f"config root must be a mapping, got {type(raw)}")
    raw = _substitute(raw)
    ov = {k: v for k, v in (overrides or {}).items() if v is not None}
    if ov.get("wal_dir"):
        raw.pop("wal_sources", None)
    raw.update(ov)
    cfg = _validate(raw, SCHEMA, "")
    if "follow" in cfg:
        cfg["follow"] = _validate(cfg["follow"], FOLLOW_SCHEMA, "follow.")
    if cfg.get("merge_policy") not in (None, "lww", "fww"):
        raise ConfigError(
            f"merge_policy must be lww or fww, got {cfg['merge_policy']!r}")
    if bool(cfg.get("wal_dir")) == bool(cfg.get("wal_sources")):
        raise ConfigError("exactly one of wal_dir / wal_sources is required")
    if "wal_sources" in cfg:
        for k, v in cfg["wal_sources"].items():
            if not isinstance(v, str):
                raise ConfigError(f"wal_sources.{k}: expected str, got {v!r}")
    return cfg


def job_from_config(cfg: dict):
    """Build a CDCJob from a validated config dict."""
    from .pipelines.cdc import CDCJob

    kwargs = {k: cfg[k] for k in JOB_KEYS if k in cfg}
    wal = cfg.get("wal_sources") or cfg["wal_dir"]
    return CDCJob(cfg["table_dir"], wal, **kwargs)
