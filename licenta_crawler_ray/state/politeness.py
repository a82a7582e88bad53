"""Per-host politeness + robots gate (SURVEY §2.3 T1/T3, §4).

The reference's politeness mechanism is structural — one browser per domain,
strictly serial page visits (explicit design comment,
``BrowserCrawler.java:32-39``); robots rules are fetched once per job and
carried on the Job (``CrawlJobResource.java:113``, ``SitemapSaxCrawler.java:53``).

Rebuild semantics:
- **Robots filter**: per-host disallow prefixes; applied to every candidate
  URL (links, sitemap children, page URLs) before dedup. The rules table is
  a *small side*: ``ray.put`` once, read in every gate task — never
  re-shipped per batch and never a shuffle join.
- **Per-host budget**: at most ``budget`` fetches per host per wave; the
  remainder stays in the frontier for later waves (carry-over). Within a
  wave a host's selected rows are processed lowest-priority-first; host-hash
  partitioning means one logical owner per host. Because record ranks are
  derived from discovery (depth, doc_order), not wall time, budget throttling
  never changes the final visited set or its order (SURVEY §4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


class RobotRules:
    """Immutable per-host robots rules (disallow prefixes + advertised sitemaps)."""

    def __init__(self, per_host: dict[str, dict]):
        # normalize: host -> tuple of disallow path-prefixes
        self.disallow = {
            h: tuple(r.get("disallow", ())) for h, r in per_host.items()
        }
        self.sitemaps = {h: list(r.get("sitemaps", ())) for h, r in per_host.items()}
        # optional per-host Crawl-delay seconds (the reference-inferred
        # RobotDefaults semantic, SURVEY §2.3 T3); absent hosts are governed
        # by the structural per-host budget only
        self.crawl_delay = {
            h: float(r["crawl_delay"]) for h, r in per_host.items()
            if r.get("crawl_delay")
        }

    def allowed_one(self, url: str, host: str) -> bool:
        rules = self.disallow.get(host)
        if not rules:
            return True
        # path starts after scheme://host
        idx = url.find("/", url.find("//") + 2)
        path = url[idx:] if idx >= 0 else "/"
        return not any(path.startswith(p) for p in rules)

    def allowed(self, urls: list[str], hosts: list[str]) -> np.ndarray:
        return np.fromiter(
            (self.allowed_one(u, h) for u, h in zip(urls, hosts)),
            dtype=bool,
            count=len(urls),
        )

    def sitemaps_for(self, host: str) -> list[str]:
        return self.sitemaps.get(host, [])


class RobotsGate:
    """``map_batches`` stage: drop robots-disallowed candidate rows.

    Constructed with an object ref to the broadcast :class:`RobotRules`
    (``ray.put`` on the driver); resolves it once per actor in ``__init__``
    — the actor-pool pattern for stateful stages.
    """

    def __init__(self, rules_ref):
        self.rules: RobotRules = ray.get(rules_ref) if not isinstance(rules_ref, RobotRules) else rules_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        ok = self.rules.allowed(
            batch.column("url").to_pylist(), batch.column("host").to_pylist()
        )
        return batch.filter(pa.array(ok))


class PolitenessClock:
    """Per-host Crawl-delay enforcement on a LOGICAL wave clock.

    The sandbox has no wall-clock network, so delay runs on logical time:
    each wave advances every delayed host's token bucket by
    ``wave_seconds / crawl_delay`` fetch tokens (burst-capped at the
    structural ``host_budget``); a wave may fetch at most ``floor(tokens)``
    pages from that host. A host with ``crawl_delay == wave_seconds``
    fetches one page per wave; slower hosts skip waves. Because record
    ranks derive from discovery (depth, doc_order), not wall time,
    throttling defers rows to later waves WITHOUT changing the final
    visited set or its order (SURVEY §4) — the property the parity tests
    pin down. Deterministic: pure arithmetic on wave numbers.
    """

    WAVE_SECONDS = 1.0

    def __init__(self, crawl_delay: dict[str, float], host_budget: int,
                 wave_seconds: float = WAVE_SECONDS):
        self.delay = {h: d for h, d in crawl_delay.items() if d > 0}
        self.budget = host_budget if host_budget >= 0 else 1 << 30
        self.wave_seconds = wave_seconds
        self.tokens: dict[str, float] = {}

    def tick(self) -> None:
        """Advance logical time by one wave. First tick grants exactly one
        immediate fetch (a polite crawler need not wait before page one)."""
        for h, d in self.delay.items():
            prev = self.tokens.get(h)
            self.tokens[h] = (
                1.0 if prev is None
                else min(float(self.budget), prev + self.wave_seconds / d)
            )

    def limits(self) -> dict[str, int]:
        """host → max fetches this wave, for DELAYED hosts only."""
        return {h: min(self.budget, int(t)) for h, t in self.tokens.items()}

    def spend(self, host_counts: dict[str, int]) -> None:
        for h, k in host_counts.items():
            if h in self.tokens and k:
                self.tokens[h] -= float(k)


def select_with_clock(
    fdf: pd.DataFrame, clock: "PolitenessClock | None", host_budget: int
) -> tuple[pd.DataFrame, pd.DataFrame, int]:
    """Shared per-wave politeness selection — the ONE home for the
    budget + crawl-delay semantics, so the wave and bucket engines'
    output-parity contract is structural, not two hand-kept copies.

    Sorts the frontier lowest-priority-first, caps each host at
    ``host_budget`` (or its clock limit when delayed — ticking the clock
    once), and returns ``(selected, leftovers, throttled)`` where
    ``throttled`` counts rows deferred ONLY because of crawl-delay."""
    fdf = fdf.sort_values(["priority", "url"], kind="mergesort")
    cum = fdf.groupby("host", sort=False).cumcount()
    throttled = 0
    clocked = clock is not None and bool(clock.delay)
    if clocked:
        clock.tick()
        cap = fdf["host"].map(clock.limits()).fillna(host_budget)
        within = (cum < cap).to_numpy()
        throttled = int(((cum < host_budget).to_numpy() & ~within).sum())
    else:
        within = (cum < host_budget).to_numpy()
    selected = fdf[within]
    leftovers = fdf[~within]
    if clocked and len(selected):
        sel_hosts = selected["host"]
        clock.spend(
            sel_hosts[sel_hosts.isin(clock.delay)].value_counts().to_dict()
        )
    return selected, leftovers, throttled


