"""Wave-loop crawl driver — the Spark re-expression of the reference's
producer / child-process / consumer pipeline (process_manager.py:185-207
+ http_request_downloader.py:116-175), serialized into deterministic
micro-batch waves (SURVEY.md §3 E1).

Each wave is one Spark job chain:

    cand     = frontier (robots-filtered)
    admitted = per-host AIMD budget window         (politeness.admit)
    fetched  = applyInPandas fetch kernel          (fetch.run_fetch)
    frontier = (frontier - admitted) + failures    (anti-join + union)
    seen    += successful url hashes               (bloom shard insert)
    budgets  = AIMD update from wave counts        (plans.rate_control)
    pages   += successes; fetch_log += metrics     (IcebergLite append)
    checkpoint(frontier, seen, budgets, snapshots) (exact resume)

Scale properties: the frontier is split into a small ACTIVE slice
(each host's top active_slice_waves x max_budget rows under the
admission order) and a static BACKLOG that steady-state waves never
read — admission ranks, anti-joins, and requeues touch only the active
slice, and the backlog is scanned only at refills (when a host's
remaining original slice could dip below max_budget) and at durable
checkpoints. The split covers DISCOVERY mode: discovered URLs dedup
against the seen set + the bounded active slice only, and a duplicate
of a still-backlogged row is dropped when that row surfaces (refill /
checkpoint re-split). Robots rules are applied ONCE at insertion
(static per run), so steady-state waves skip the filter and a blocked
crawl drains exactly. Result assembly is incremental over a bounded
incomplete-seeds pool (no per-interval pages-table scan). Per-host
frontier counts are maintained incrementally on the driver (bounded
deltas per wave). The admitted side of every join is budget-bounded ->
broadcast; seen-set maintenance touches one blob per shard per wave;
the only global sort is over the admitted set (<= hosts x max_budget
rows) for the crawl-order contract. Per-wave flatness in backlog size
is measured by scripts/bench_backlog.py.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import frontier as frontier_ops
from ..operators.assemble import assemble_results
from ..operators.fetch import run_fetch, with_fetch_order
from ..operators.politeness import admit, robots_filter
from ..operators.seen import SeenSet
from ..schemas import (
    EXHAUSTED_SEEDS_SCHEMA,
    FRONTIER_SCHEMA,
    INCOMPLETE_POOL_SCHEMA,
    PAGE_TYPES,
    SEEN_SHARDS_SCHEMA,
)
from ..sources.iceberg_lite import IcebergLiteTable
from .rate_control import BudgetTable

# fixed partition count for the materialized incomplete-seeds pool: the
# pool is row-bounded (in-flight incomplete seeds), so a handful of
# partitions is enough at any scale, and pinning it stops partition
# counts compounding across checkpoint intervals (see finalize_increment)
POOL_PARTITIONS = 8

# post-fetch coalesce sizing: downstream per-wave consumers read the
# cached kernel output through a coalesce of ceil(rows / this) tasks
# (capped at defaultParallelism) — 1 task for politeness-bounded waves,
# proportional fan-in for genuinely large ones
COALESCE_ROWS_PER_TASK = 4096


@dataclass
class CrawlConfig:
    n_salts: int = 32
    n_shards: int = 64
    seen_kind: str = "bloom"          # 'bloom' | 'cuckoo'
    insert_on: str = "success"         # 'success' | 'admission' (cuckoo)
    fail_rate: float = 0.0             # stub-transport fault probability
    max_fail_attempts: int = 3         # stub: URL succeeds after this many
    max_retries: int | None = 10       # None = reference's infinite default
    max_waves: int = 200
    max_budget: int = 160              # cpu*5 analog (rate_control.py:30)
    init_budget: float | None = None   # warm-start AIMD cur (bench only)
    checkpoint_every: int = 1          # durable ckpt cadence (waves)
    wave_seconds: float = 1.0          # Crawl-delay -> per-wave cap basis
    discover: bool = False             # recursive link discovery
    shard_capacity: int = 1_000_000
    robots_by_host: dict = field(default_factory=dict)
    agent: str = "fundcrawler"
    # fetch transport: 'stub' (deterministic offline) | 'http' (live
    # urllib GETs via sources/http_transport — the kernel a real user
    # points at a live site; unit-tested against localhost only)
    transport: str = "stub"
    # debug cross-check: re-derive the incremental per-host frontier
    # counts with a full groupBy each wave and assert they agree
    verify_host_counts: bool = False
    # active-slice sizing: the wave loop holds each host's top
    # (active_slice_waves x max_budget) frontier rows in a small ACTIVE
    # set and leaves the rest in a static BACKLOG it only reads at
    # refill time / durable checkpoints — steady-state waves are
    # O(active), not O(frontier). 0 disables the split (active = all).
    active_slice_waves: int = 8
    # optional per-wave telemetry callback: receives one dict per wave
    # with phase wall times (refill / fetch+agg / discover-dedup /
    # checkpoint) and flags — used by scripts/bench_backlog.py to
    # attribute wave-time outliers; None = zero overhead
    wave_hook: object = None

    def __post_init__(self) -> None:
        # insert_on='admission' buffers ('delete', failed-urls) ops so a
        # failed fetch can be retried; only the cuckoo filter supports
        # delete, so reject the bloom combination at construction time
        # rather than silently corrupting the seen set at settle time
        if self.insert_on == "admission" and self.seen_kind != "cuckoo":
            raise ValueError(
                "insert_on='admission' requires seen_kind='cuckoo' "
                "(bloom filters cannot delete failed admissions)"
            )
        if self.seen_kind not in ("bloom", "cuckoo"):
            raise ValueError(f"unknown seen_kind {self.seen_kind!r}")
        if self.insert_on not in ("success", "admission"):
            raise ValueError(f"unknown insert_on {self.insert_on!r}")
        if self.transport not in ("stub", "http"):
            raise ValueError(f"unknown transport {self.transport!r}")


def dedup_backlog_rows(seen: SeenSet, shards: DataFrame, rows: DataFrame,
                       active: DataFrame) -> DataFrame:
    """Discover-mode backlog dedup: drop backlog ``rows`` whose URL was
    already fetched (seen-set probe) or is pending in the active slice
    (anti-join vs the bounded active keys). Discovery inserts new URLs
    into ACTIVE after checking seen+active only — a duplicate of a
    still-backlogged row is allowed to exist until that backlog row
    SURFACES (at refill or at a durable-checkpoint re-split), where this
    function drops it. Exactly-once holds: the moved/active sides are
    bounded, so this is a broadcast anti-join + an O(rows) probe — never
    an O(frontier) scan per wave (r3 verdict item 1)."""
    out = seen.probe(shards, rows).filter(~F.col("seen")).drop("seen")
    return out.join(
        F.broadcast(active.select("url_hash").distinct()), "url_hash", "left_anti"
    )


class Crawler:
    def __init__(self, spark: SparkSession, workdir: str, config: CrawlConfig | None = None):
        self.spark = spark
        self.workdir = workdir
        self.cfg = config or CrawlConfig()
        self.seen = SeenSet(
            spark, self.cfg.n_shards, self.cfg.seen_kind, self.cfg.shard_capacity
        )
        os.makedirs(workdir, exist_ok=True)
        self.pages = IcebergLiteTable(os.path.join(workdir, "tables", "pages"))
        self.images = IcebergLiteTable(os.path.join(workdir, "tables", "images"))
        self.results = IcebergLiteTable(os.path.join(workdir, "tables", "results"))
        self.fetch_log = IcebergLiteTable(os.path.join(workdir, "tables", "fetch_log"))
        self.ckpt_root = os.path.join(workdir, "checkpoints")
        os.makedirs(self.ckpt_root, exist_ok=True)

    # ----------------------------------------------------- checkpointing

    def _ckpt_dir(self, wave: int) -> str:
        return os.path.join(self.ckpt_root, f"wave={wave:05d}")

    def _prepare_ckpt_dir(self, wave: int) -> str:
        d = self._ckpt_dir(wave)
        if os.path.exists(d):
            shutil.rmtree(d)
        return d

    def _write_frontier_seen(self, d: str, frontier: DataFrame,
                             shards: DataFrame) -> None:
        """The two flush-independent component writes (disjoint paths,
        no lineage into the buffered table appends) — overlapped with
        each other here and, at durable-checkpoint waves, with the whole
        flush_appends chain (guide §2.6)."""
        from concurrent.futures import ThreadPoolExecutor

        writes = [
            lambda: frontier.write.parquet(os.path.join(d, "frontier")),
            # shard blobs are few, fixed-count rows; n_shards write
            # tasks produced n_shards near-empty files + footer-stat
            # reads per checkpoint. 8 shards/file keeps bench
            # checkpoints at a handful of files and the 1024-shard x
            # ~10 MB design point at ~128 files of ~80 MB (guide §6).
            # Layout only — resume re-reads and re-shuffles by shard id.
            lambda: shards.coalesce(max(1, self.cfg.n_shards // 8)).write.parquet(
                os.path.join(d, "seen")),
        ]
        with ThreadPoolExecutor(max_workers=2) as ex_pool:
            for fut in [ex_pool.submit(w) for w in writes]:
                fut.result()

    def _finish_checkpoint(self, d: str, wave: int, budgets: BudgetTable,
                           order_offset: int,
                           incomplete: DataFrame | None = None,
                           exhausted: DataFrame | None = None) -> None:
        """Post-flush component writes + meta + commit marker. Runs
        strictly after flush_appends so the pool/exhausted frames and
        the recorded table snapshot ids all reflect the same interval
        boundary; the _COMPLETE marker is still written only after
        every component write returned."""
        from concurrent.futures import ThreadPoolExecutor

        # the incomplete-seeds pool + exhausted-seed set ride the
        # checkpoint so resume is O(pool), not a full pages-table scan
        # (the pool is bounded by in-flight incomplete seeds; exhausted
        # by permanently-failed seeds)
        writes = []
        if incomplete is not None:
            writes.append(
                lambda: incomplete.select("seed_index", "page_type", "body")
                .write.parquet(os.path.join(d, "incomplete"))
            )
        if exhausted is not None:
            writes.append(
                lambda: exhausted.write.parquet(os.path.join(d, "exhausted"))
            )
        if writes:
            with ThreadPoolExecutor(max_workers=2) as ex_pool:
                for fut in [ex_pool.submit(w) for w in writes]:
                    fut.result()
        meta = {
            "wave": wave,
            "order_offset": order_offset,
            "has_incomplete_pool": incomplete is not None,
            "has_exhausted": exhausted is not None,
            "budgets": budgets.to_dict(),
            "snapshots": {
                "pages": self.pages.current_snapshot(),
                "images": self.images.current_snapshot(),
                "results": self.results.current_snapshot(),
                "fetch_log": self.fetch_log.current_snapshot(),
            },
        }
        with open(os.path.join(d, "meta.json"), "w") as f:
            json.dump(meta, f)
        # commit marker LAST -> a torn checkpoint is never resumed from
        open(os.path.join(d, "_COMPLETE"), "w").close()

    def _write_checkpoint(self, wave: int, frontier: DataFrame, shards: DataFrame,
                          budgets: BudgetTable, order_offset: int,
                          incomplete: DataFrame | None = None,
                          exhausted: DataFrame | None = None) -> None:
        d = self._prepare_ckpt_dir(wave)
        self._write_frontier_seen(d, frontier, shards)
        self._finish_checkpoint(d, wave, budgets, order_offset,
                                incomplete=incomplete, exhausted=exhausted)

    def latest_checkpoint(self) -> int | None:
        waves = [
            int(n.split("=")[1])
            for n in os.listdir(self.ckpt_root)
            if n.startswith("wave=")
            and os.path.exists(os.path.join(self.ckpt_root, n, "_COMPLETE"))
        ]
        return max(waves) if waves else None

    def _load_checkpoint(
        self, wave: int
    ) -> tuple[DataFrame, DataFrame, BudgetTable, int, DataFrame | None, DataFrame | None, dict]:
        d = self._ckpt_dir(wave)
        with open(os.path.join(d, "meta.json")) as f:
            meta = json.load(f)
        # rewind table snapshots to exactly the checkpointed state
        for name, tbl in (
            ("pages", self.pages), ("images", self.images),
            ("results", self.results), ("fetch_log", self.fetch_log),
        ):
            snap = meta["snapshots"][name]
            if snap is not None and tbl.current_snapshot() != snap:
                tbl.rollback(snap)
        frontier = self.spark.read.schema(FRONTIER_SCHEMA).parquet(os.path.join(d, "frontier"))
        shards = self.spark.read.schema(SEEN_SHARDS_SCHEMA).parquet(os.path.join(d, "seen"))
        budgets = BudgetTable.from_dict(meta["budgets"], max_num=float(self.cfg.max_budget))
        pool = (
            self.spark.read.schema(INCOMPLETE_POOL_SCHEMA)
            .parquet(os.path.join(d, "incomplete"))
            if meta.get("has_incomplete_pool")
            else None
        )
        exhausted = (
            self.spark.read.schema(EXHAUSTED_SEEDS_SCHEMA)
            .parquet(os.path.join(d, "exhausted"))
            if meta.get("has_exhausted")
            else None
        )
        return frontier, shards, budgets, meta["order_offset"], pool, exhausted, meta

    def _workdir_dirty(self) -> bool:
        return self.latest_checkpoint() is not None or any(
            t.current_snapshot() is not None
            for t in (self.pages, self.images, self.results, self.fetch_log)
        )

    def _reset_workdir(self) -> None:
        """Truncate table dirs + checkpoints (callers gate this behind an
        explicit ``overwrite=True`` — it destroys a prior crawl)."""
        shutil.rmtree(self.ckpt_root, ignore_errors=True)
        os.makedirs(self.ckpt_root, exist_ok=True)
        tables_root = os.path.join(self.workdir, "tables")
        shutil.rmtree(tables_root, ignore_errors=True)
        self.pages = IcebergLiteTable(os.path.join(tables_root, "pages"))
        self.images = IcebergLiteTable(os.path.join(tables_root, "images"))
        self.results = IcebergLiteTable(os.path.join(tables_root, "results"))
        self.fetch_log = IcebergLiteTable(os.path.join(tables_root, "fetch_log"))

    # ------------------------------------------------------------- run

    def run(self, seeds: DataFrame | None = None, resume: bool = False,
            overwrite: bool = False, log=print) -> dict:
        cfg = self.cfg
        spark = self.spark

        # robots filtering happens ONCE, at insertion time (seeds /
        # resume load / discoveries) — robots config is static per run,
        # so permanently-disallowed rows never enter the frontier, every
        # steady-state wave skips the filter entirely, and a blocked
        # crawl terminates exactly when the ADMITTABLE frontier drains
        # (the r3 spin-to-max_waves wart). Requeued failures were
        # admitted, hence already allowed.
        def robots_drop(df: DataFrame) -> DataFrame:
            if cfg.robots_by_host:
                return robots_filter(df, cfg.robots_by_host, cfg.agent)
            return df

        seeds_path = os.path.join(self.workdir, "seeds.parquet")
        if resume:
            last = self.latest_checkpoint()
            if last is None:
                raise RuntimeError("no complete checkpoint to resume from")
            (frontier, shards, budgets, order_offset,
             ckpt_pool, ckpt_exhausted, ckpt_meta) = self._load_checkpoint(last)
            frontier = robots_drop(frontier)
            wave = last + 1
            seeds = spark.read.parquet(seeds_path)
            log(f"[crawl] resumed from checkpoint wave={last}")
        else:
            assert seeds is not None, "fresh run needs a seeds DataFrame"
            # a fresh run into a previously-used workdir must not stack
            # appends on the old run's tables or leave stale checkpoints
            # a later resume would silently pick up against new seeds —
            # truncate both explicitly before wave 0. The truncate is
            # destructive (drops a prior crawl's pages/results), so it
            # requires an explicit overwrite=True; the default refuses.
            if self._workdir_dirty():
                if not overwrite:
                    raise RuntimeError(
                        f"workdir {self.workdir!r} holds a prior crawl "
                        "(tables or checkpoints present); pass resume=True "
                        "to continue it or overwrite=True to discard it"
                    )
                self._reset_workdir()
            seeds.write.mode("overwrite").parquet(seeds_path)
            seeds = spark.read.parquet(seeds_path)
            frontier0 = frontier_ops.seeds_to_frontier(seeds, cfg.n_salts)
            shards = self.seen.empty_shards()
            # probe-at-insert: drop URLs already in the seen set (no-op on
            # an empty set; meaningful when seeding an existing crawl)
            probed = self.seen.probe(shards, frontier0)
            frontier = robots_drop(probed.filter(~F.col("seen")).drop("seen"))
            budgets = BudgetTable(max_num=float(cfg.max_budget), init_cur=cfg.init_budget)
            wave, order_offset = 0, 0

        from ..operators.politeness import RobotsMatcher

        robots_caps = {
            h: RobotsMatcher(txt, cfg.agent).budget_cap(cfg.wave_seconds)
            for h, txt in cfg.robots_by_host.items()
        }

        # pages/fetch_log appends batch at checkpoint boundaries: the
        # durable table state only matters AT a checkpoint (resume rolls
        # snapshots back to one), so waves in between buffer their
        # persisted fetch results and commit as one snapshot — same
        # rows, checkpoint_every x fewer table commits
        pending_pages: list[DataFrame] = []
        pending_logs: list[DataFrame] = []
        pending_persisted: list[DataFrame] = []
        pending_exhausted: list[DataFrame] = []

        # -------- incremental finalize: incomplete-seeds side pool ----
        # Barrier pages (the 4 PAGE_TYPES) of seeds that have NOT yet
        # passed the 4-page barrier. Each finalize interval unions the
        # interval's new barrier pages in, assembles + appends exactly
        # the seeds that just completed, and evicts them — so the pool
        # is bounded by in-flight incomplete seeds and a seed's result
        # row is appended EXACTLY ONCE (a completed seed leaves the
        # pool and can never re-trigger, even when a discovered
        # ANNOUNCE page for it arrives later — the r3 duplicate-results
        # bug). Replaces the per-interval full pages-table scan: cost
        # is O(interval + in-flight partial pages), not O(pages table).
        # Seeds with a retry-exhausted page can NEVER pass the barrier
        # (the page's URL left the frontier without succeeding), so they
        # are evicted from the pool — otherwise each permanent failure
        # would pin its partial pages in the per-interval union forever
        # (r4 verdict item 4). The set is cumulative (a late sibling
        # page of an exhausted seed must not re-enter the pool) and
        # bounded by permanently-failed seeds.
        # On resume the pool + exhausted set are read straight from the
        # checkpoint (O(pool), no pages-table scan); pre-pool-format
        # checkpoints fall back to the one-time pages-table rebuild.
        incomplete: DataFrame | None = None
        exhausted_all: DataFrame | None = None
        if resume:
            if "has_incomplete_pool" in ckpt_meta:
                incomplete = (
                    ckpt_pool.localCheckpoint() if ckpt_pool is not None else None
                )
                exhausted_all = (
                    ckpt_exhausted.localCheckpoint()
                    if ckpt_exhausted is not None else None
                )
            else:
                pages_tbl = self.pages.read(spark)
                if pages_tbl is not None:
                    barrier = pages_tbl.filter(
                        F.col("page_type").isin(list(PAGE_TYPES))
                    ).select("seed_index", "page_type", "body")
                    partial = (
                        barrier.groupBy("seed_index")
                        .agg(F.count_distinct("page_type").alias("npt"))
                        .filter(F.col("npt") < len(PAGE_TYPES))
                        .select("seed_index")
                    )
                    incomplete = barrier.join(partial, "seed_index").localCheckpoint()

        def note_exhausted(new_exhausted: DataFrame | None) -> None:
            """Fold this interval's retry-exhausted seed indexes into the
            cumulative set and evict their pages from the pool — they can
            never complete, so without eviction they'd be re-unioned and
            re-aggregated every interval forever."""
            nonlocal incomplete, exhausted_all
            if new_exhausted is None:
                return
            exhausted_all = (
                new_exhausted if exhausted_all is None
                else exhausted_all.unionByName(new_exhausted)
            ).distinct().localCheckpoint()
            if incomplete is not None:
                incomplete = incomplete.join(
                    F.broadcast(exhausted_all), "seed_index", "left_anti"
                ).localCheckpoint()

        # fine-grained flush timing for the wave_hook (ckpt_detail);
        # written by flush_appends/finalize_increment, read at the
        # durable-checkpoint branch — zero cost beyond a few time() calls
        flush_detail: dict = {}

        def finalize_increment(new_pages: DataFrame) -> None:
            """Per-checkpoint-interval finalize: fold this interval's
            barrier pages into the incomplete-seeds pool, assemble +
            append results for seeds that just completed, evict them
            from the pool (the images enrich job runs in parallel from
            flush_appends — it depends only on new_pages). Snapshot
            alignment: runs inside flush_appends, i.e. BEFORE
            _write_checkpoint records results/images snapshot ids, so
            resume rolls all four tables back to the same boundary (the
            pool is rebuilt from the pages table)."""
            nonlocal incomplete

            # barrier pages ONLY: discover-mode ANNOUNCE successes carry
            # the discovering seed's seed_index but are NOT one of the 4
            # barrier types, so they can never (re-)enter the pool — in
            # discover runs the pool still drains to zero once every
            # seed completes or exhausts (tests/test_pool.py
            # test_pool_drains_in_discover_mode)
            new_barrier = new_pages.filter(
                F.col("page_type").isin(list(PAGE_TYPES))
            ).select("seed_index", "page_type", "body")
            pool = (
                new_barrier if incomplete is None
                else incomplete.unionByName(new_barrier)
            )
            # pages of retry-exhausted seeds never enter (or re-enter)
            # the pool — see note_exhausted
            if exhausted_all is not None:
                pool = pool.join(
                    F.broadcast(exhausted_all), "seed_index", "left_anti"
                )
            # materialize the pool ONCE, at a small fixed partition
            # count, before the three consumers below (assemble, done
            # agg, evict anti-join). Without the repartition the pool
            # inherits the interval union's partitions (waves x shuffle
            # partitions) AND carries the prior pool's on top, so each
            # interval's localCheckpoint schedules O(cumulative-interval)
            # mostly-empty tasks — measured 12.6 s -> 51.3 s across two
            # checkpoints of an identical-size workload (the r5 A/B
            # creep); pinning to POOL_PARTITIONS keeps every flush
            # O(interval). The pool itself is row-bounded (in-flight
            # incomplete seeds), so 8 partitions hold at any scale.
            t_mat = time.time()
            pool = pool.repartition(POOL_PARTITIONS, "seed_index").localCheckpoint()
            t0 = time.time()
            flush_detail["flush_pool_mat_sec"] = round(t0 - t_mat, 3)

            # the results append and the pool eviction both read ONLY
            # the materialized pool (plus the static seeds / the done
            # agg) and write disjoint targets (results table vs the
            # driver's `incomplete` ref) — overlap them (guide §2.6);
            # serially they were two back-to-back sub-second
            # driver-synchronous chains per flush
            def _append_results() -> None:
                results_new = assemble_results(pool, seeds)
                # interval-bounded rows; shrink from shuffle-partition
                # count to pool-scale write tasks (same small-write
                # rationale as the fetch_log flush)
                self.results.append(results_new.coalesce(POOL_PARTITIONS))
                flush_detail["flush_assemble_sec"] = round(time.time() - t0, 3)

            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=1) as res_pool:
                fut_res = res_pool.submit(_append_results)
                # seeds completing this interval (bounded) leave the pool
                done = (
                    pool.groupBy("seed_index")
                    .agg(F.count_distinct("page_type").alias("npt"))
                    .filter(F.col("npt") == len(PAGE_TYPES))
                    .select("seed_index")
                )
                incomplete = pool.join(
                    F.broadcast(done), "seed_index", "left_anti"
                ).localCheckpoint()
                flush_detail["flush_pool_evict_sec"] = round(time.time() - t0, 3)
                fut_res.result()
            flush_detail["flush_results_sec"] = round(time.time() - t0, 3)

        def flush_appends() -> None:
            if pending_exhausted:
                ex = pending_exhausted[0]
                for d in pending_exhausted[1:]:
                    ex = ex.unionByName(d)
                note_exhausted(ex)
                pending_exhausted.clear()
            df_pages = None
            if pending_pages:
                df_pages = pending_pages[0]
                for d in pending_pages[1:]:
                    df_pages = df_pages.unionByName(d)
            df_logs = None
            if pending_logs:
                df_logs = pending_logs[0]
                for d in pending_logs[1:]:
                    df_logs = df_logs.unionByName(d)
                # telemetry rows are interval-bounded (waves x hosts x
                # partition ids) but the union carries waves x
                # shuffle-partitions mostly-empty partitions; 1 write
                # task, 1 file
                df_logs = df_logs.coalesce(1)

            # the three append targets are DISTINCT tables reading from
            # the same cached wave frames, so their jobs are independent
            # — submit pages/fetch_log from a 2-thread pool while the
            # main thread runs the finalize chain (guide §2.6: overlap
            # independent jobs; the flush was a serial chain of ~8
            # driver-synchronous sub-second jobs and its wall time was
            # pure latency, not compute — r7 profile)
            from concurrent.futures import ThreadPoolExecutor

            def _append_pages():
                t0 = time.time()
                self.pages.append(df_pages)
                flush_detail["flush_pages_sec"] = round(time.time() - t0, 3)

            def _append_logs():
                t0 = time.time()
                self.fetch_log.append(df_logs)
                flush_detail["flush_logs_sec"] = round(time.time() - t0, 3)

            def _append_images():
                from ..operators.multimodal import enrich_images
                from ..operators.politeness import with_page_ordinal

                t0 = time.time()
                raw = with_page_ordinal(df_pages).select(
                    F.concat_ws("_", F.lit("img"), "seed_index", "page_ordinal").alias("image_id"),
                    F.col("image_bytes").alias("bytes"),
                    "caption",
                )
                self.images.append(enrich_images(raw))
                flush_detail["flush_images_sec"] = round(time.time() - t0, 3)

            with ThreadPoolExecutor(max_workers=3) as ex_pool:
                futs = []
                if df_pages is not None:
                    futs.append(ex_pool.submit(_append_pages))
                    futs.append(ex_pool.submit(_append_images))
                if df_logs is not None:
                    futs.append(ex_pool.submit(_append_logs))
                if df_pages is not None:
                    finalize_increment(df_pages)
                for fut in futs:
                    fut.result()
            pending_pages.clear()
            pending_logs.clear()

        def release_caches() -> None:
            # Only AFTER the durable checkpoint has written the seen
            # shards: the shard lineage is a chain of lazy
            # localCheckpoint(eager=False) inserts that still reads the
            # cached fetched/admitted frames. Unpersisting earlier would
            # recompute up to checkpoint_every waves of fetch work at the
            # checkpoint write — and with a non-deterministic transport
            # the recomputed outcomes could desync the seen set from the
            # pages rows already committed.
            for d in pending_persisted:
                d.unpersist()
            pending_persisted.clear()

        # Seen-shard maintenance is deferred: a wave only APPENDS its
        # key frame to pending_seen (driver-side list of plans over the
        # wave's cached fetched/admitted frames — no Spark job, no plan
        # compile; the r5 phase audit measured ~1.2 s/wave of driver
        # time for even a LAZY per-wave shards.localCheckpoint, all of
        # it physical-plan compilation). settle_shards() folds the
        # buffer into the shards right before anything READS them: the
        # discovery probe (every wave in discover mode), the refill
        # dedup, and the durable/final checkpoint writes. In static
        # mode that is checkpoint cadence only, so the steady-state
        # wave does zero shard work. Chaining raw insert plans instead
        # would be exponential: each _mutate level references its
        # parent twice (untouched anti-join + touched semi-join), so
        # the fold truncates via localCheckpoint(eager=False) after
        # every applied op.
        pending_seen: list[tuple[str, DataFrame]] = []
        # blob broadcast of the LAST-SETTLED shards (bloom discover fast
        # path) — invalidated whenever the shards change
        settled_bc = None

        def invalidate_settled_bc() -> None:
            nonlocal settled_bc
            if settled_bc is not None:
                settled_bc.unpersist()
                settled_bc = None

        def settle_shards() -> None:
            nonlocal shards
            if not pending_seen:
                return
            invalidate_settled_bc()
            if cfg.seen_kind == "bloom":
                # bloom blobs are bitwise order-independent (an insert
                # ORs hash positions; n_items adds), so folding all
                # buffered inserts as ONE batched insert is bit-identical
                # to the per-wave sequence — one cogroup level and one
                # plan compile per settle instead of per wave. (bloom
                # has no delete, so the buffer is inserts only.) Guard
                # that invariant loudly: a buffered ('delete', ...)
                # frame silently ORed into the bloom would make failed
                # URLs permanently 'seen' (never refetched).
                bad_ops = {op for op, _ in pending_seen if op != "insert"}
                if bad_ops:
                    raise AssertionError(
                        "bloom seen-set buffered non-insert ops "
                        f"{sorted(bad_ops)}: bloom filters cannot delete "
                        "(use seen_kind='cuckoo' with insert_on='admission')"
                    )
                df = pending_seen[0][1]
                for _, d in pending_seen[1:]:
                    df = df.unionByName(d)
                shards = self.seen.insert(shards, df).localCheckpoint(eager=False)
            else:
                # cuckoo blobs are insertion-order-sensitive (eviction
                # paths): replay the exact per-wave op sequence — same
                # kernel batches as the old per-wave path, bit-identical
                # blobs — truncating after each level
                for op, d in pending_seen:
                    fn = self.seen.insert if op == "insert" else self.seen.delete
                    shards = fn(shards, d).localCheckpoint(eager=False)
            pending_seen.clear()

        def probe_unfetched(rows: DataFrame) -> DataFrame:
            """``rows`` minus already-fetched URLs — the per-wave
            discover dedup. Bloom fast path: probe the LAST-SETTLED
            shards (blobs collected + broadcast ONCE per settle, reused
            every wave) and anti-join the buffered insert keys exactly
            (wave-bounded, broadcast) — so the steady discover wave does
            ZERO shard cogroups instead of two (settle-fold + probe),
            and the blobs still materialize bit-identically at the next
            settle (refill / durable checkpoint). Exactness: seen =
            settled ∪ buffered, and the exact anti-join has strictly
            fewer false positives than probing the folded bloom. Cuckoo
            buffers carry deletes (order-sensitive), so that path
            settles first, as before."""
            nonlocal settled_bc
            if cfg.seen_kind != "bloom":
                settle_shards()
                return self.seen.probe(shards, rows).filter(~F.col("seen")).drop("seen")
            if settled_bc is None:
                total = (
                    shards.select(F.sum(F.length("blob")).alias("b")).first()["b"]
                    or 0
                )
                if total <= self.seen.BROADCAST_PROBE_BYTES:
                    settled_bc = self.seen.broadcast_blobs(shards)
            if settled_bc is not None:
                out = self.seen.probe(shards, rows, bc=settled_bc)
            else:
                out = self.seen.probe(shards, rows, mode="cogroup")
            out = out.filter(~F.col("seen")).drop("seen")
            if pending_seen:
                keys = pending_seen[0][1]
                for _, d in pending_seen[1:]:
                    keys = keys.unionByName(d)
                out = out.join(
                    F.broadcast(keys.distinct()), "url_hash", "left_anti"
                )
            return out

        # ---- split frontier: ACTIVE slice + static BACKLOG -----------
        # Admission only ever needs each host's top-`budget` rows, so
        # the frontier is held as a small ACTIVE set (per-host top
        # slice_k rows under the admission total order) plus a BACKLOG
        # the steady-state wave never touches. Requeues and discoveries
        # enter ACTIVE directly (retry-first rows outrank everything;
        # discoveries must be rank-eligible immediately); the backlog
        # is read only when a host refills — i.e. when the conservative
        # lower bound on its remaining ORIGINAL slice drops below
        # max_budget, at which point rows ranked below the whole
        # remaining slice could otherwise be needed — and at durable
        # checkpoints, whose frontier parquet is the backlog+active
        # union (checkpoint format and resume are unchanged).
        # Correctness of admitting from ACTIVE only: every backlog row
        # ranks below every original-slice row of its host (the slice
        # was the exact top-K and per-row order keys are static), so as
        # long as >= budget original rows remain, the per-wave winner
        # set over ACTIVE equals the winner set over the full frontier.
        # Discovery mode runs the SAME split: discovered URLs enter
        # ACTIVE after dedup against seen + active only; a duplicate of
        # a still-backlogged row is dropped when that backlog row
        # surfaces (dedup_backlog_rows at refill / checkpoint re-split),
        # so each URL is still fetched exactly once. Scheduling note:
        # such a duplicate is admitted under the DISCOVERED row's rank
        # (page_type/priority of the discovery), not the backlog row's —
        # a documented divergence that can only occur when a discovered
        # URL collides with a never-yet-active seeded URL; the
        # reference's seed URLs and discovered announcement URLs are
        # disjoint namespaces, so its replay is unaffected.
        # Per-host counts are maintained INCREMENTALLY on the driver —
        # bounded deltas per wave; cfg.verify_host_counts re-derives
        # them with a full groupBy as a cross-check (golden tests).
        slice_k = max(cfg.active_slice_waves, 1) * max(cfg.max_budget, 1)
        split_enabled = cfg.active_slice_waves > 0

        from ..operators.politeness import top_slice_keys

        active: DataFrame = frontier
        backlog: DataFrame | None = None
        active_counts: dict[str, int] = {}
        backlog_total: dict[str, int] = {}
        backlog_admittable: dict[str, int] = {}
        orig_rem_lb: dict[str, int] = {}

        def split_frontier(src: DataFrame, total: dict[str, int] | None = None) -> None:
            nonlocal active, backlog, active_counts, backlog_total
            nonlocal backlog_admittable, orig_rem_lb
            if total is None:
                total = {
                    r["host"]: r["count"]
                    for r in src.groupBy("host").count().collect()
                }
            if not split_enabled:
                active, backlog = src, None
                active_counts = dict(total)
                backlog_total, backlog_admittable = {}, {}
                orig_rem_lb = dict(total)
                return
            keys = top_slice_keys(
                src, slice_k, approx_rows=sum(total.values())
            ).localCheckpoint()
            active = src.join(F.broadcast(keys), "url_hash").localCheckpoint()
            backlog = src.join(F.broadcast(keys), "url_hash", "left_anti")
            active_counts = {
                r["host"]: r["count"]
                for r in active.groupBy("host").count().collect()
            }
            backlog_total = {
                h: c - active_counts.get(h, 0)
                for h, c in total.items()
                if c - active_counts.get(h, 0) > 0
            }
            # robots-disallowed rows are dropped at insertion, so every
            # frontier row is admittable by construction
            backlog_admittable = dict(backlog_total)
            orig_rem_lb = dict(active_counts)

        def refill(hosts: list[str]) -> None:
            nonlocal active, backlog
            sub = backlog.filter(F.col("host").isin(hosts))
            approx = sum(backlog_admittable.get(h, 0) for h in hosts)
            keys = top_slice_keys(
                sub, slice_k, approx_rows=approx
            ).localCheckpoint()
            moved = backlog.join(F.broadcast(keys), "url_hash").localCheckpoint()
            # amortized: one backlog rewrite per ~active_slice_waves
            # waves, instead of an O(frontier) rank every wave
            backlog = backlog.join(
                F.broadcast(keys), "url_hash", "left_anti"
            ).localCheckpoint()
            # full per-host counts leave the backlog dicts; in discover
            # mode only the rows SURVIVING the dedup (not already
            # fetched / not pending in active) enter the active dicts
            moved_counts = {
                r["host"]: r["count"]
                for r in moved.groupBy("host").count().collect()
            }
            if cfg.discover:
                settle_shards()
                moved = dedup_backlog_rows(
                    self.seen, shards, moved, active
                ).localCheckpoint()
                surv_counts = {
                    r["host"]: r["count"]
                    for r in moved.groupBy("host").count().collect()
                }
            else:
                surv_counts = moved_counts
            for h, c in moved_counts.items():
                s = surv_counts.get(h, 0)
                if s:
                    active_counts[h] = active_counts.get(h, 0) + s
                    orig_rem_lb[h] = orig_rem_lb.get(h, 0) + s
                for d in (backlog_total, backlog_admittable):
                    left = d.get(h, 0) - c
                    if left > 0:
                        d[h] = left
                    else:
                        d.pop(h, None)
            active = active.unionByName(moved)

        def frontier_union() -> DataFrame:
            return active if backlog is None else backlog.unionByName(active)

        def durable_frontier(act: DataFrame) -> DataFrame:
            """backlog+active union for durable checkpoints. Discover
            mode first drops stale backlog copies (already fetched, or
            pending in active) so a checkpoint re-split can never
            re-admit a fetched URL — the probe rides the checkpoint's
            existing O(frontier) rewrite, steady-state waves stay
            O(active)."""
            if backlog is None:
                return act
            bl = backlog
            if cfg.discover:
                settle_shards()
                bl = dedup_backlog_rows(self.seen, shards, bl, act)
            return bl.unionByName(act)

        frontier = frontier.persist()
        pending_persisted.append(frontier)
        split_frontier(frontier)

        while wave < cfg.max_waves:
            t_wave0 = time.time()
            if cfg.verify_host_counts:
                actual = {
                    r["host"]: r["count"]
                    for r in frontier_union().groupBy("host").count().collect()
                }
                tracked = {
                    h: active_counts.get(h, 0) + backlog_total.get(h, 0)
                    for h in set(active_counts) | set(backlog_total)
                    if active_counts.get(h, 0) + backlog_total.get(h, 0) > 0
                }
                assert actual == tracked, {
                    h: (tracked.get(h), actual.get(h))
                    for h in set(actual) | set(tracked)
                    if actual.get(h) != tracked.get(h)
                }
            n_frontier = sum(active_counts.values()) + sum(backlog_total.values())
            if n_frontier == 0:
                break
            need: list[str] = []
            if split_enabled:
                need = [
                    h for h in list(backlog_admittable)
                    if backlog_admittable.get(h, 0) > 0
                    and orig_rem_lb.get(h, 0) < cfg.max_budget
                ]
                if need:
                    refill(need)
            t_refill_done = time.time()
            hosts_seen = {
                h
                for h in set(active_counts) | set(backlog_total)
                if active_counts.get(h, 0) + backlog_total.get(h, 0) > 0
            }
            wave_budgets = {h: budgets.budget_for(h) for h in hosts_seen}
            # robots Crawl-delay caps admission per wave (politeness.py)
            for h, cap in robots_caps.items():
                if h in wave_budgets and cap is not None:
                    wave_budgets[h] = min(wave_budgets[h], cap)

            # per-wave candidate set = ACTIVE only; no robots filter
            # here — disallowed rows never entered the frontier
            # (insertion-time drop), requeues were admitted hence
            # allowed, discoveries were filtered on insert
            cand = active
            admitted = admit(cand, wave_budgets, cfg.max_budget,
                             approx_rows=sum(active_counts.values()))
            admitted.persist()

            fetched_raw = run_fetch(admitted, cfg.fail_rate, cfg.max_fail_attempts,
                                    wave=wave, discover=cfg.discover,
                                    expected_rows=sum(wave_budgets.values()),
                                    transport=cfg.transport)
            fetched_raw.persist()
            fetched = fetched_raw
            # one collect yields the AIMD observation (s, f) AND the
            # frontier-count deltas: admitted = s + f rows leave, rq
            # (= fails still under the retry cap) re-enter
            requeue_ok = F.col("state") == "FALSE"
            if cfg.max_retries is not None:
                requeue_ok = requeue_ok & (F.col("retry_count") < cfg.max_retries)
            wave_agg = {
                r["host"]: (r["s"], r["f"], r["rq"])
                for r in fetched.groupBy("host")
                .agg(
                    F.count_if(F.col("state") == "SUCCESS").alias("s"),
                    F.count_if(F.col("state") == "FALSE").alias("f"),
                    F.count_if(requeue_ok).alias("rq"),
                )
                .collect()
            }
            t_agg_done = time.time()
            counts = {h: (s, f) for h, (s, f, _) in wave_agg.items()}
            n_admitted = sum(s + f for s, f in counts.values())
            # deterministic crawl order from the SAME collected counts:
            # per-host prefix-sum offsets attach as a literal map over
            # the cached kernel output — no global single-partition
            # WindowExec per wave (r5 verdict item 3)
            fetched = with_fetch_order(
                fetched, {h: s + f for h, (s, f) in counts.items()}, order_offset
            )
            # narrow the wave's downstream reads back to O(1) tasks: r5
            # persisted the post-window SinglePartition frame, so every
            # consumer (eviction filter, pages/metrics/seen buffers,
            # requeue) ran 1-task jobs; removing the window left them
            # scanning the fetch kernel's full fan-out (≥32 blocks of
            # ~5 rows) — ~31 extra tasks × several jobs × 412 waves cost
            # ~200 s on the full replay. coalesce is a NARROW dep over
            # the already-materialized cached blocks (the wave_agg
            # collect above populated them): no exchange, no kernel
            # recompute, and the task count still scales with the
            # wave's actual row count for genuinely large waves.
            if n_admitted:
                fetched = fetched.coalesce(
                    min(
                        spark.sparkContext.defaultParallelism,
                        max(1, -(-n_admitted // COALESCE_ROWS_PER_TASK)),
                    )
                )
            # both stay cached until the buffered appends flush — the
            # pending pages/metrics plans read from these cached blocks
            pending_persisted.extend([fetched_raw, admitted])
            # AIMD tick: exactly one ring update per host per wave; done
            # BEFORE the metrics append so fetch_log carries the same
            # post-observation (fail_rate, tasks_num, threshold) triple
            # the reference's analyse mode records per update
            # (rate_control.py:42-47)
            budgets.observe_wave(counts, hosts_seen)

            if n_admitted:
                order_offset += n_admitted

                # seeds whose BARRIER page just exhausted its retry
                # budget can never complete — queue them for pool
                # eviction at the next flush (lazy, reads the cached
                # fetched frame). Restricted to the 4 barrier PAGE_TYPES:
                # a retry-exhausted *discovered* URL (e.g. ANNOUNCE)
                # carries the discovering seed's seed_index but does not
                # block the 4-page barrier, so it must not evict the seed
                if cfg.max_retries is not None:
                    pending_exhausted.append(
                        fetched.filter(
                            (F.col("state") == "FALSE")
                            & (F.col("retry_count") >= cfg.max_retries)
                            & F.col("page_type").isin(list(PAGE_TYPES))
                        ).select("seed_index")
                    )
                ok = fetched.filter(F.col("state") == "SUCCESS")
                pending_pages.append(ok.select(
                    "url_hash", "url", "host", "page_type", "seed_index",
                    "retry_count", "body", "image_bytes", "caption", "wave", "fetch_order",
                ))
                # metrics + per-partition lineage + AIMD telemetry.
                # The per-host telemetry triple is driver-side data; it
                # attaches as a LITERAL map lookup, not a createDataFrame
                # + broadcast join — the buffered metrics plans flush
                # checkpoint_every at a time, and one broadcast per
                # buffered wave cost ~8 s per flush on its own (r5 A/B
                # creep audit). Hosts are bounded (the reference crawls
                # one site; robots/budget tables are driver dicts), but
                # a >256-host wave falls back to the broadcast join to
                # keep the literal plan small.
                tel_rows = [
                    (h, *budgets.telemetry_for(h)) for h in sorted(hosts_seen)
                ]
                wall_ms = (time.time() - t_wave0) * 1000.0
                metrics = (
                    fetched.withColumn("partition_id", F.spark_partition_id())
                    .groupBy("wave", "host", "partition_id")
                    .agg(
                        F.count("*").alias("n_admitted"),
                        F.count_if(F.col("state") == "SUCCESS").alias("n_success"),
                        F.count_if(F.col("state") == "FALSE").alias("n_fail"),
                    )
                )
                if len(tel_rows) <= 256:
                    tel_map = F.create_map(*[
                        part
                        for h, fr, bu, th in tel_rows
                        for part in (
                            F.lit(h),
                            F.array(F.lit(float(fr)), F.lit(float(bu)), F.lit(float(th))),
                        )
                    ])
                    metrics = (
                        metrics.withColumn("_tel", tel_map[F.col("host")])
                        .withColumn("fail_rate_w10", F.col("_tel")[0])
                        .withColumn("budget", F.col("_tel")[1])
                        .withColumn("threshold", F.col("_tel")[2])
                    )
                else:
                    tel = spark.createDataFrame(
                        tel_rows,
                        "host string, fail_rate_w10 double, budget double, threshold double",
                    )
                    metrics = metrics.join(F.broadcast(tel), "host", "left")
                metrics = metrics.withColumn("wall_ms", F.lit(wall_ms)).select(
                    "wave", "host", "n_admitted", "n_success", "n_fail",
                    "fail_rate_w10", "budget", "threshold", "partition_id", "wall_ms",
                )
                pending_logs.append(metrics)

                # frontier update touches ONLY the active slice
                rest = frontier_ops.remove_admitted(active, admitted)
                active_next = frontier_ops.requeue_failures(
                    rest, fetched, wave + 1, cfg.max_retries
                )
                # incremental counts: -admitted +requeued, all active-side
                for h, (s, f, rq) in wave_agg.items():
                    nxt = active_counts.get(h, 0) - (s + f) + rq
                    if nxt > 0:
                        active_counts[h] = nxt
                    else:
                        active_counts.pop(h, None)
                    orig_rem_lb[h] = max(orig_rem_lb.get(h, 0) - (s + f), 0)

                # seen-set maintenance: buffer the wave's key frames —
                # folded into the shards by settle_shards() at the next
                # shard read
                if cfg.insert_on == "admission":
                    pending_seen.append(("insert", admitted.select("url_hash")))
                    fails = fetched.filter(F.col("state") == "FALSE")
                    pending_seen.append(("delete", fails.select("url_hash")))
                else:
                    pending_seen.append(("insert", ok.select("url_hash")))

                # recursive frontier growth: discovered links enter the
                # frontier after the dedup triangle — batch-distinct,
                # anti-join vs pending frontier, seen-set probe
                if cfg.discover:
                    from ..functions.urlnorm import (
                        canonicalize_url, host_salt, url_hash, url_host,
                    )

                    disc = (
                        ok.select(F.explode("links").alias("url"), "seed_index")
                        .dropDuplicates(["url"])
                        .withColumn("url_norm", canonicalize_url(F.col("url")))
                        .withColumn("url_hash", url_hash(F.col("url_norm")))
                        .withColumn("host", url_host(F.col("url_norm")))
                        .withColumn("host_salt", host_salt(F.col("host"), cfg.n_salts, F.col("url_norm")))
                        .withColumn("page_type", F.lit("ANNOUNCE"))
                        .withColumn("retry_count", F.lit(0).cast("int"))
                        .withColumn("priority", F.col("seed_index"))
                        .withColumn("wave", F.lit(wave + 1).cast("int"))
                        .select(
                            "url", "url_norm", "url_hash", "host", "host_salt",
                            "page_type", "seed_index", "retry_count", "priority", "wave",
                        )
                    )
                    # robots check at insertion (static per run) — a
                    # disallowed discovery never enters the frontier
                    disc = robots_drop(disc)
                    # dedup against the PENDING ACTIVE set + seen set
                    # only — O(active), never O(frontier). A duplicate
                    # of a still-backlogged row is allowed in; it is
                    # dropped when the backlog row surfaces
                    # (dedup_backlog_rows at refill / checkpoint)
                    disc = disc.join(active_next.select("url_hash"), "url_hash", "left_anti")
                    disc = probe_unfetched(disc)
                    # the discovery set is wave-bounded (admitted x links
                    # per page), so counting it is NOT an O(frontier)
                    # scan; cached so the count and the union share one
                    # computation, released at the next durable ckpt
                    disc = disc.persist()
                    for r in disc.groupBy("host").count().collect():
                        active_counts[r["host"]] = active_counts.get(r["host"], 0) + r["count"]
                    pending_persisted.append(disc)
                    active_next = active_next.unionByName(disc)
            else:
                active_next = active
            t_disc_done = time.time()
            ckpt_detail: dict = {}

            # durable checkpoint every cfg.checkpoint_every waves (and on
            # the final wave, detected next iteration); in between, a
            # localCheckpoint cuts lineage without the parquet round-trip
            # — resume granularity vs per-wave overhead is the knob
            if wave % cfg.checkpoint_every == cfg.checkpoint_every - 1:
                # table commits align with durable checkpoints: flush the
                # buffered appends FIRST so the checkpoint's snapshot ids
                # capture exactly waves <= this one. The checkpoint
                # frontier is the backlog+active union (same schema and
                # format as ever — resume is unchanged); the reloaded
                # parquet is then re-split, which doubles as a full
                # refill at checkpoint cadence.
                t_f0 = time.time()
                # file-count-adaptive frontier write: ~50k rows/file
                # instead of a fixed n_salts files (8k bench rows wrote
                # 32 near-empty files); still hash-clustered by url_hash
                n_front_now = sum(active_counts.values()) + sum(backlog_total.values())
                settle_shards()
                full = durable_frontier(active_next).repartition(
                    min(cfg.n_salts, max(1, -(-n_front_now // 50_000))), "url_hash"
                )
                # overlap the frontier/seen component writes with the
                # table flush (guide §2.6): they read only the settled
                # shards + the immutable active/backlog frames, while
                # the flush appends to the four IcebergLite tables and
                # updates the pool — disjoint outputs, no shared
                # mutable state. The pool/exhausted writes, meta
                # snapshot ids and the _COMPLETE marker still land
                # strictly AFTER the flush (r7: serial flush 1.7 s +
                # write 1.1 s -> overlapped ~1.8 s wall per checkpoint)
                from concurrent.futures import ThreadPoolExecutor

                ckpt_d = self._prepare_ckpt_dir(wave)
                with ThreadPoolExecutor(max_workers=1) as fs_pool:
                    fut_fs = fs_pool.submit(
                        self._write_frontier_seen, ckpt_d, full, shards
                    )
                    flush_appends()
                    t_f1 = time.time()
                    fut_fs.result()
                self._finish_checkpoint(ckpt_d, wave, budgets, order_offset,
                                        incomplete=incomplete,
                                        exhausted=exhausted_all)
                t_f2 = time.time()
                ckpt_detail = {"ckpt_flush_sec": round(t_f1 - t_f0, 3),
                               "ckpt_write_sec": round(t_f2 - t_f1, 3),
                               **flush_detail}
                flush_detail.clear()
                d = self._ckpt_dir(wave)
                src = spark.read.schema(FRONTIER_SCHEMA).parquet(os.path.join(d, "frontier"))
                shards = spark.read.schema(SEEN_SHARDS_SCHEMA).parquet(os.path.join(d, "seen"))
                invalidate_settled_bc()
                release_caches()
                src = src.persist()
                pending_persisted.append(src)
                # discover mode: the durable dedup may have dropped
                # stale backlog copies, so counts must be re-derived
                merged = None if cfg.discover else {
                    h: active_counts.get(h, 0) + backlog_total.get(h, 0)
                    for h in set(active_counts) | set(backlog_total)
                    if active_counts.get(h, 0) + backlog_total.get(h, 0) > 0
                }
                split_frontier(src, total=merged)
            else:
                # lazy active checkpoint: truncates lineage but defers
                # materialization to the next wave's admit/fetch job —
                # the active slice is control-plane-sized, and its eager
                # localCheckpoint was a whole driver-synchronous job per
                # wave (~1.2 s of the 3.6 s steady wave, r5 phase
                # telemetry). The shards are NOT touched here at all:
                # their plan chains until settle_shards() at the next
                # read (even a lazy localCheckpoint compiles a physical
                # plan per call — another ~1.2 s/wave of driver time).
                n_act = sum(active_counts.values())
                active = active_next.repartition(
                    # scale-adaptive: the active slice is control-plane
                    # sized, and pinning it to n_salts partitions made
                    # every steady-wave stage schedule n_salts
                    # mostly-empty tasks (r7 A/B: 65.6 -> 79.2 pages/s
                    # with 4x fewer); genuinely large waves still fan
                    # out to the full n_salts
                    min(cfg.n_salts, max(1, -(-n_act // COALESCE_ROWS_PER_TASK))),
                    "url_hash",
                ).localCheckpoint(eager=False)
            if cfg.wave_hook is not None:
                t_end = time.time()
                cfg.wave_hook({
                    "wave": wave,
                    "n_admitted": n_admitted,
                    "refilled_hosts": len(need),
                    "durable_ckpt": wave % cfg.checkpoint_every == cfg.checkpoint_every - 1,
                    "refill_sec": round(t_refill_done - t_wave0, 3),
                    "fetch_agg_sec": round(t_agg_done - t_refill_done, 3),
                    "discover_sec": round(t_disc_done - t_agg_done, 3),
                    "checkpoint_sec": round(t_end - t_disc_done, 3),
                    "wave_sec": round(t_end - t_wave0, 3),
                    **ckpt_detail,
                })
            log(f"[crawl] wave={wave} frontier={n_frontier} admitted={n_admitted}")
            wave += 1

        # final durable checkpoint so the last state is always resumable
        flush_appends()
        if wave > 0 and self.latest_checkpoint() != wave - 1:
            settle_shards()
            n_front_now = sum(active_counts.values()) + sum(backlog_total.values())
            self._write_checkpoint(
                wave - 1,
                durable_frontier(active).repartition(
                    min(cfg.n_salts, max(1, -(-n_front_now // 50_000))), "url_hash"
                ),
                shards, budgets, order_offset,
                incomplete=incomplete, exhausted=exhausted_all,
            )
        release_caches()

        # ---- finalize: results/images were assembled INCREMENTALLY at
        # each checkpoint interval (finalize_increment above) — no
        # end-of-run full recompute over the whole pages table
        stats = {"waves": wave, "pages_fetched": order_offset}
        results = self.results.read(spark)
        if results is not None:
            stats["results"] = results.count()
        # pool-boundedness telemetry (both counts are pool-sized actions):
        # after a crawl drains, every seed is either complete or
        # retry-exhausted, so the pool must be empty
        stats["incomplete_pool_rows"] = (
            incomplete.count() if incomplete is not None else 0
        )
        stats["exhausted_seeds"] = (
            exhausted_all.count() if exhausted_all is not None else 0
        )
        return stats
