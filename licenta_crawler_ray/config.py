"""Config profiles — the reference's externalized settings surface.

The reference keeps fetcher settings out of code: a properties loader
(``BrowserCrawlerSettingsUtil.java:21-35``) reads per-profile files
selected by three Maven profiles (``pom.xml:117-166`` — local dev, remote
debug, production). The rebuild mirrors that with named profiles over the
engine's knobs, resolvable from built-ins or a user JSON file, with CLI
flags taking final precedence:

    profile defaults  <  config-file profile  <  explicit CLI flags

Profile keys (all optional): ``engine``, ``host_budget``, ``num_cpus``,
``enrich``, ``fetch_leaves``, ``fetch_cache_bytes``. The cache budget is
applied through the documented ``LCR_FETCH_CACHE_BYTES`` seam (exported
before ``ray.init`` so workers inherit it).

Config file format::

    {"default_profile": "prod",
     "profiles": {"prod": {"engine": "bucket", "host_budget": 256, ...}}}
"""

from __future__ import annotations

import json

# built-in profiles ≙ the reference's three Maven profiles: a fast local
# loop, a conservative debug mode, and the scale configuration
BUILTIN_PROFILES: dict[str, dict] = {
    "local": {
        "engine": "pool",
        "host_budget": 64,
        "num_cpus": 8,
        "enrich": False,
        "fetch_cache_bytes": 64 << 20,
    },
    "debug": {
        "engine": "pool",
        "host_budget": 8,          # small waves → readable lineage
        "num_cpus": 4,
        "enrich": False,
        "fetch_cache_bytes": 32 << 20,
    },
    "production": {
        "engine": "bucket",        # zero-barrier scale engine
        "host_budget": 256,
        "enrich": True,
        "fetch_cache_bytes": 256 << 20,
    },
}

_ALLOWED_KEYS = {
    "engine", "host_budget", "num_cpus", "enrich", "fetch_leaves",
    "fetch_cache_bytes",
}


def load_profile(name: str | None = None, path: str | None = None) -> dict:
    """Resolve one settings dict from a builtin or config-file profile.

    ``path`` points at a JSON config file; its profiles shadow same-named
    builtins. ``name=None`` uses the file's ``default_profile`` (or empty
    settings with no file). Unknown keys raise — a typo'd knob must not
    silently no-op (the 400-style strictness of the job-spec validator).
    """
    profiles = dict(BUILTIN_PROFILES)
    default_name = None
    if path is not None:
        with open(path) as f:
            doc = json.load(f)
        for pname, spec in doc.get("profiles", {}).items():
            bad = set(spec) - _ALLOWED_KEYS
            if bad:
                raise ValueError(f"profile {pname!r}: unknown keys {sorted(bad)}")
            profiles[pname] = {**profiles.get(pname, {}), **spec}
        default_name = doc.get("default_profile")
    name = name or default_name
    if name is None:
        return {}
    if name not in profiles:
        raise ValueError(
            f"unknown profile {name!r}; have {sorted(profiles)}"
        )
    return dict(profiles[name])


def merge_settings(profile: dict, cli: dict) -> dict:
    """Profile values overridden by explicitly-set (non-None) CLI values."""
    out = dict(profile)
    out.update({k: v for k, v in cli.items() if v is not None})
    return out
