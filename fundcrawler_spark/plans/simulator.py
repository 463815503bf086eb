"""Reference-semantics crawl simulator — the executable spec.

The reference's real scheduler is race-dependent (thread completion
order); SURVEY.md §4.4 defines the deterministic serialization of its
rules, and THIS module is that spec, in ~100 lines of pure Python:

  * per-host AIMD budgets — the verbatim formula semantics
    (rate_control.py:49-82) via the same HostRate class the engine uses
  * admission: per host, order by (retry_count DESC, priority ASC,
    seed_index ASC, page_ordinal ASC), take budget rows — retry-first
    mirrors http_request_downloader.py:162-166
  * global crawl order within a wave: (host ASC, host_rank ASC)
  * failures requeue with retry_count+1 (downloader :146-153), bounded
    by max_retries
  * seen set: successful url hashes (exact set + the same BloomShard
    blobs the engine builds, for bit-for-bit comparison)

The Spark engine must reproduce this simulator's crawl order, seen set
and per-wave budgets EXACTLY — that is the golden conformance gate.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..operators.seen import BloomShard
from ..schemas import PAGE_ORDINAL
from ..sources.stub_transport import fault_kind
from .rate_control import BudgetTable


@dataclass
class SimRow:
    url: str
    url_hash: int
    host: str
    page_type: str
    seed_index: int
    priority: int
    retry_count: int = 0


def simulate(
    rows: list[dict],
    fail_rate: float = 0.0,
    max_fail_attempts: int = 3,
    max_retries: int | None = 10,
    max_waves: int = 200,
    max_budget: int = 160,
    n_shards: int = 64,
    shard_capacity: int = 1_000_000,
    discover_map: dict | None = None,
) -> dict:
    """rows: dicts with url, url_hash, host, page_type, seed_index,
    priority (i.e. a collected initial frontier). ``discover_map``
    enables recursive discovery: {discovered_url: (url_hash, host)} —
    a success of an OVERVIEW/MANAGER page discovers its fund's
    announcements URL exactly like the engine's stub transport."""
    frontier = [SimRow(r["url"], r["url_hash"], r["host"], r["page_type"],
                       r["seed_index"], r["priority"]) for r in rows]
    budgets = BudgetTable(max_num=float(max_budget))
    order: list[tuple[int, int, int]] = []  # (fetch_order, url_hash, wave)
    seen: set[int] = set()
    budget_trace: list[dict] = []
    fetch_order = 0
    wave = 0

    def sort_key(t: SimRow):
        # unknown page types (e.g. discovered ANNOUNCE) sort after the
        # enum, matching politeness.with_page_ordinal's otherwise(len)
        return (-t.retry_count, t.priority, t.seed_index,
                PAGE_ORDINAL.get(t.page_type, len(PAGE_ORDINAL)))

    while frontier and wave < max_waves:
        hosts_seen = {t.host for t in frontier}
        wave_budgets = {h: budgets.budget_for(h) for h in hosts_seen}
        budget_trace.append({"wave": wave, **wave_budgets})

        admitted: list[SimRow] = []
        by_host: dict[str, list[SimRow]] = {}
        for t in frontier:
            by_host.setdefault(t.host, []).append(t)
        for host in sorted(by_host):
            q = sorted(by_host[host], key=sort_key)
            admitted.extend(q[: wave_budgets.get(host, 0)])

        counts: dict[str, tuple[int, int]] = {}
        admitted_ids = {id(t) for t in admitted}
        next_frontier = [t for t in frontier if id(t) not in admitted_ids]
        wave_results: list[tuple[SimRow, bool]] = []
        # global order: host ASC then per-host rank (already in order)
        for t in admitted:
            fetch_order += 1
            order.append((fetch_order, t.url_hash, wave))
            kind = fault_kind(t.url_hash, t.retry_count, fail_rate, max_fail_attempts)
            s, f = counts.get(t.host, (0, 0))
            if kind is None:
                counts[t.host] = (s + 1, f)
                seen.add(t.url_hash)
                wave_results.append((t, True))
            else:
                counts[t.host] = (s, f + 1)
                wave_results.append((t, False))
                if max_retries is None or t.retry_count < max_retries:
                    t.retry_count += 1
                    next_frontier.append(t)

        if discover_map:
            from ..sources.stub_transport import (
                DISCOVER_SOURCES, classify_url, discovered_url,
            )

            pending = {t.url_hash for t in next_frontier}
            for t, succeeded in wave_results:
                if not succeeded or t.page_type not in DISCOVER_SOURCES:
                    continue
                code, _ = classify_url(t.url)
                if not code:
                    continue
                durl = discovered_url(code)
                if durl not in discover_map:
                    continue
                dhash, dhost = discover_map[durl]
                if dhash in seen or dhash in pending:
                    continue
                next_frontier.append(SimRow(durl, dhash, dhost, "ANNOUNCE",
                                            t.seed_index, t.seed_index))
                pending.add(dhash)

        budgets.observe_wave(counts, hosts_seen)
        frontier = next_frontier
        wave += 1

    # expected bloom blobs, built with the engine's own shard class
    shards: dict[int, BloomShard] = {}
    for h in sorted(seen):
        sid = h % n_shards
        shards.setdefault(sid, BloomShard.sized(shard_capacity)).insert(
            np.array([h], dtype=np.int64)
        )
    blobs = {sid: s.to_blob() for sid, s in shards.items()}

    return {
        "order": order,
        "seen": seen,
        "waves": wave,
        "budget_trace": budget_trace,
        "bloom_blobs": blobs,
    }
