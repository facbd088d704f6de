"""Sequential reference simulator — ground truth for order/seen-set tests.

Single-threaded, dict-and-list reimplementation of the crawl semantics
(SURVEY.md §5.2.2): the reference's strict-order loop with persisted
progress (crawler/src/crawler.ts:295-442) generalized to the wave model
under the same politeness budgets the engine uses. Shares ``extract_page``,
``normalize_url`` and the seq-hash with the engine, so any divergence is
an engine bug, not an oracle mismatch.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .config import DISCOVERED_SEQ_BASE, CrawlConfig
from .extraction.core import extract_page
from .hashing import ad_id_for, stable_hash64
from .robots import disallowed_checker, host_budgets
from .urlnorm import normalize_url, url_host, url_path


@dataclass
class SimResult:
    order: list[tuple[str, int]]            # (url, wave) in fetch order
    seen: set[str] = field(default_factory=set)
    states: dict[str, str] = field(default_factory=dict)
    admitted_from: dict[str, str | None] = field(default_factory=dict)
    depths: dict[str, int] = field(default_factory=dict)
    hosts: dict[str, str | None] = field(default_factory=dict)
    # J4 lineage: url -> referrer ad id for landing pages, None otherwise
    ad_ids: dict[str, int | None] = field(default_factory=dict)
    # True iff the frontier emptied before the wave horizon (the
    # engine's run() 'completed' vs 'horizon' crawl_meta event)
    drained: bool = False
    # (url, wave) attempts that were Z2 timeouts (or corpus misses) —
    # they appear in `order` (the engine schedules them) but the engine
    # writes NO results row for them, so the oracle trace must skip
    # them too. Keyed per-attempt: a retry that later succeeds gets its
    # own fetched (url, wave') entry.
    unfetched_attempts: set[tuple[str, int]] = field(default_factory=set)


def simulate_crawl(pages: dict[str, bytes],
                   seeds: list[tuple[int, str]],
                   robots_rows: list[tuple[str, str]],
                   config: CrawlConfig) -> SimResult:
    budgets = host_budgets(robots_rows, config.wave_seconds,
                           config.default_budget)
    check_disallowed = disallowed_checker(robots_rows)

    # frontier entry: url -> (host, path, depth, priority, seq, state)
    frontier: dict[str, dict] = {}
    admitted_from: dict[str, str | None] = {}

    def admit(url, host, path, depth, seq, state, src, ad_id=None):
        frontier[url] = {"host": host, "path": path, "depth": depth,
                         "priority": float(depth), "seq": seq,
                         "state": state, "attempts": 0, "ad_id": ad_id}
        admitted_from[url] = src

    # ---- bootstrap: seed-list order, first occurrence wins --------------
    for seq, raw in seeds:
        norm = normalize_url(raw)
        if norm is None:
            if raw not in frontier:
                admit(raw, None, None, 0, int(seq), "invalid", None)
            continue
        if norm in frontier:
            continue
        host, path = url_host(norm), url_path(norm)
        state = "disallowed" if check_disallowed(host, path) else "pending"
        admit(norm, host, path, 0, int(seq), state, None)

    order: list[tuple[str, int]] = []
    unfetched_attempts: set[tuple[str, int]] = set()
    drained = False
    wave = 1
    while wave <= config.max_waves:
        pending = [(u, e) for u, e in frontier.items()
                   if e["state"] == "pending"]
        if not pending:
            drained = True
            break
        # per-host priority queue under budgets (W1/W2)
        by_host: dict[str, list] = {}
        for u, e in pending:
            by_host.setdefault(e["host"], []).append((u, e))
        planned: list[tuple[str, dict, bool]] = []
        for host in by_host:
            # url is the FINAL tiebreaker everywhere (here, plan_wave's
            # windows, crawl_order): discovered-URL seq is a 31-bit
            # hash, and a (priority, seq) collision straddling the
            # budget cutoff would otherwise be resolved by Python's
            # stable insertion order here but arbitrarily by Spark's
            # unstable sort in the engine.
            q = sorted(by_host[host],
                       key=lambda t: (t[1]["priority"], t[1]["seq"], t[0]))
            b = budgets.get(host, config.default_budget)
            for rank, (u, e) in enumerate(q[:b], start=1):
                # Z2 site time budget: fetch #rank on this host lands at
                # virtual time rank * (wave_seconds / budget)
                timed_out = (
                    config.site_budget_seconds is not None
                    and rank * (config.wave_seconds / b)
                    > config.site_budget_seconds)
                planned.append((u, e, timed_out))
        if not planned:
            drained = True
            break
        # global fetch order = (wave, host, priority, seq, url) — the
        # parallelism-invariant total order (SURVEY §7.3)
        planned.sort(key=lambda t: (t[1]["host"], t[1]["priority"],
                                    t[1]["seq"], t[0]))
        # max_urls frontier cap — same pre-wave check as the engine
        # (frontier size counts every admitted row incl. invalid seeds)
        admission_open = (config.max_urls is None
                          or len(frontier) < config.max_urls)
        candidates: dict[str, tuple[int, str]] = {}  # url -> (depth, src)
        cand_meta: dict[str, tuple[str, str]] = {}   # url -> (host, path)
        for url, e, timed_out in planned:
            if timed_out:
                e["attempts"] += 1
                if e["attempts"] >= config.max_retries:
                    e["state"] = "timeout"
                order.append((url, wave))
                unfetched_attempts.add((url, wave))
                continue
            html = pages.get(url)
            if html is None:
                # Z5: retry budget — stays pending until attempts exhaust
                e["attempts"] += 1
                if e["attempts"] >= config.max_retries:
                    e["state"] = "error"
                order.append((url, wave))
                unfetched_attempts.add((url, wave))
                continue
            e["state"] = "fetched"
            order.append((url, wave))
            if (not admission_open or e["depth"] >= config.max_depth
                    or wave + 1 > config.max_waves):
                continue
            if e["ad_id"] is not None:
                continue  # landing pages are scraped, never expanded
            res = extract_page(url, html)
            # candidate key = (depth, kind, src, ad_sentinel): first
            # occurrence by depth, links (kind 0) beat ad landings
            # (kind 1) at equal depth — the same min-struct the engine's
            # in-wave dedup takes
            for link in res.links:
                norm = normalize_url(link)
                if norm is None:
                    continue
                host = url_host(norm)
                if config.same_host_only and host != e["host"]:
                    continue
                key = (e["depth"], 0, url, -1)
                if norm not in candidates or key < candidates[norm]:
                    candidates[norm] = key
                    cand_meta[norm] = (host, url_path(norm))
            if config.admit_ad_landings:
                # first anchor of up to max_ad_landings_per_page ads
                # with an anchor, in ad_index order — the per-page
                # click cap (click.ts:122-133); cross-host allowed
                n_taken = 0
                for ad_index, ad in enumerate(res.ads):
                    if n_taken >= config.max_ad_landings_per_page:
                        break
                    if not ad.anchor_hrefs:
                        continue
                    n_taken += 1
                    norm = normalize_url(ad.anchor_hrefs[0])
                    if norm is None:
                        continue
                    key = (e["depth"], 1, url, ad_id_for(url, ad_index))
                    if norm not in candidates or key < candidates[norm]:
                        candidates[norm] = key
                        cand_meta[norm] = (url_host(norm), url_path(norm))
        for norm, (src_depth, kind, src, ad_sent) in candidates.items():
            if norm in frontier:
                continue
            host, path = cand_meta[norm]
            state = ("disallowed" if check_disallowed(host, path)
                     else "pending")
            seq = DISCOVERED_SEQ_BASE + stable_hash64("seq|" + norm) % (1 << 31)
            admit(norm, host, path, src_depth + 1, seq, state, src,
                  ad_id=ad_sent if kind == 1 else None)
        wave += 1

    return SimResult(
        order=order,
        seen=set(frontier.keys()),
        states={u: e["state"] for u, e in frontier.items()},
        admitted_from=admitted_from,
        depths={u: e["depth"] for u, e in frontier.items()},
        hosts={u: e["host"] for u, e in frontier.items()},
        ad_ids={u: e["ad_id"] for u, e in frontier.items()},
        drained=drained,
        unfetched_attempts=unfetched_attempts,
    )
