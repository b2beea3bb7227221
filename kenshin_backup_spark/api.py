"""User-facing engine facade — the reference's whole lifecycle in one
object, so a user of the reference TSDB can switch without learning the
operator modules first.

The reference workflow is: configure storage schemas → send datapoints →
fetch ranges → inspect metric headers. ``Engine`` maps it 1:1:

=================  ===========================================
reference          Engine
=================  ===========================================
storage-schemas    ``policies=[Policy(...), ...]`` (ordered,
                   first match wins — carbon semantics)
send datapoints    :meth:`Engine.write` (any long frame)
fetch(m, t0, t1)   :meth:`Engine.fetch` → long (metric, ts,
                   value) frame, gap-filled, archive-routed
info(metric)       :meth:`Engine.info` → header dict
list metrics       :meth:`Engine.metrics` (glob)
retention expiry   :meth:`Engine.expire`
=================  ===========================================

Storage is one retention ladder PER POLICY under ``root/policy=<name>``
(the reference keeps one file per metric; per-policy parquet ladders are
the Spark-shaped equivalent — metrics co-partition by date with
metric-sorted row groups, so a fetch prunes to the partitions and row
groups it needs). Everything delegates to the operator modules; the
facade adds no semantics of its own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import glob_to_regex
from kenshin_backup_spark.operators.fetch import Archive, metric_filter
from kenshin_backup_spark.operators.ladder import (
    Ladder,
    build_ladder,
    compact_level,
    expire_retention,
    fetch_from_ladder,
)
from kenshin_backup_spark.operators.policies import (
    DEFAULT_POLICY,
    Policy,
    assign_policy,
)
from kenshin_backup_spark.operators.rollup import finalize
from kenshin_backup_spark.session import tune


class Engine:
    """Facade over the rollup-ladder store (see module docstring)."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        *,
        policies: list[Policy] | None = None,
        points_per_level: int = 10_000,
        metric_buckets: int = 0,
    ) -> None:
        self.spark = tune(spark)
        self.root = root.rstrip("/")
        self.policies = list(policies) if policies else [DEFAULT_POLICY]
        self._ppl = points_per_level
        # > 0 → hash-bucketed ladder layout (mbucket=/date=): exact-name
        # fetches and deletes prune to their bucket — the 100 TB layout
        self._metric_buckets = int(metric_buckets)
        self._written: set[str] = set()

    # -- storage-schema plumbing --------------------------------------------

    def _ladder(self, policy: Policy) -> Ladder:
        archives = tuple(
            Archive(step_seconds=s, points=self._ppl) for s in policy.steps
        )
        return Ladder(
            root=f"{self.root}/policy={policy.name}",
            archives=archives,
            key_cols=("metric",),
            metric_buckets=self._metric_buckets,
        )

    def policy_for(self, metric: str) -> Policy:
        """First-match policy for one metric name (carbon semantics)."""
        import re

        for p in self.policies:
            if re.search(p.pattern, metric):
                return p
        return self.policies[-1]

    # -- write path -----------------------------------------------------------

    def write(
        self,
        points: DataFrame,
        *,
        metric_col: str = "metric",
        ts_col: str = "ts",
        value_col: str = "value",
        observe_bounds: bool = False,
    ) -> tuple[int, int] | None:
        """Materialize the retention ladder(s) for a long points frame.

        Points route to their metric's policy; each policy's ladder is
        built fine→coarse with cascaded aggregates (never re-reading
        raw). Re-writing a policy's ladder replaces it (the batch
        equivalent of the streaming update sink).

        ``observe_bounds=True`` additionally returns the EXACT
        ``(min, max)`` epoch seconds of the written points' timestamps,
        captured with ``DataFrame.observe`` on the ladder-build pass
        itself — the store-backed render queries need the raw bounds to
        frame their request window, and a separate ``agg(min, max)``
        would be a second full pass over the raw input for two scalars
        the build already reads (guide §1.1). Returns ``None`` when
        nothing was written (empty input)."""
        from pyspark.sql import Observation

        pts = points.select(
            F.col(metric_col).alias("metric"),
            F.col(ts_col).alias("ts"),
            F.col(value_col).alias("value"),
        )
        lo: int | None = None
        hi: int | None = None

        def _build(sub: DataFrame, p: Policy) -> None:
            nonlocal lo, hi
            ob = None
            if observe_bounds:
                # The metrics come from the FIRST action on this plan —
                # build_ladder's fine-level write, a full pass. The
                # emptiness probes below run on the un-observed lineage,
                # so their LIMIT-1 scans can never satisfy the
                # observation with partial data.
                ob = Observation()
                es = F.unix_timestamp(F.col("ts")).cast("long")
                sub = sub.observe(
                    ob, F.min(es).alias("lo"), F.max(es).alias("hi")
                )
            build_ladder(sub, self._ladder(p))
            self._written.add(p.name)
            if ob is not None:
                got = ob.get
                if got["lo"] is not None:
                    lo = got["lo"] if lo is None else min(lo, got["lo"])
                    hi = got["hi"] if hi is None else max(hi, got["hi"])

        if len(self.policies) == 1:
            # Single-policy engine (every store-backed render query):
            # first-match-or-default routing degenerates to one predicate,
            # so skip the when-chain tag column + per-policy filter. Row
            # membership is EXACTLY the old chain's: a policy named
            # "default" absorbs the fallback (all rows); otherwise
            # membership is the null-rejecting rlike — spelled
            # metric IS NOT NULL for the match-everything '.*' pattern.
            p = self.policies[0]
            if p.name == DEFAULT_POLICY.name:
                sub = pts
            elif p.pattern == ".*":
                sub = pts.where(F.col("metric").isNotNull())
            else:
                sub = pts.where(F.col("metric").rlike(p.pattern))
            if sub.take(1):
                _build(sub, p)
        else:
            tagged = assign_policy(pts, self.policies)
            for p in self.policies:
                sub = tagged.where(F.col("policy") == p.name).drop("policy")
                if sub.take(1):
                    _build(sub, p)
        if observe_bounds:
            return (int(lo), int(hi)) if lo is not None else None
        return None

    def write_events(
        self,
        events: DataFrame,
        *,
        when_col: str = "when",
        what_col: str = "what",
        tags_col: str = "tags",
    ) -> None:
        """Record operational EVENTS (deploys, incidents — graphite's
        events API): rows of (when: timestamp-or-epoch-seconds, what:
        free text, tags: array<string>). Stored date-partitioned next to
        the metric ladders; the ``events(*tags)`` render function reads
        them back. Re-writing replaces the store (same contract as
        :meth:`write`)."""
        when = F.col(when_col)
        # accept timestamps or epoch seconds
        when_s = (
            F.unix_timestamp(when).cast("long")
            if dict(events.dtypes)[when_col].startswith("timestamp")
            else when.cast("long")
        )
        (
            events.select(
                when_s.alias("when"),
                F.col(what_col).cast("string").alias("what"),
                F.col(tags_col).cast("array<string>").alias("tags"),
            )
            .withColumn(
                "date", F.to_date(F.timestamp_seconds(F.col("when")))
            )
            .write.mode("overwrite")
            .partitionBy("date")
            .parquet(f"{self.root}/_events")
        )

    def _events_fn(self, tags: list[str]) -> DataFrame:
        """Events matching ALL requested tags (graphite find_events
        semantics), as ``when`` epoch-seconds rows."""
        import os

        path = f"{self.root}/_events"
        if not os.path.isdir(path):
            raise ValueError(
                "no event store written — call Engine.write_events first"
            )
        ev = self.spark.read.parquet(path)
        for t in tags:
            ev = ev.where(F.array_contains(F.col("tags"), t))
        return ev.select("when")

    # -- read path ------------------------------------------------------------

    @staticmethod
    def _resolve_window(
        from_ts: int | str, until_ts: int | str, now_ts: int | None
    ) -> tuple[int, int]:
        """Resolve graphite at-time strings to epoch seconds (ints pass
        through untouched). Relative forms need the injected ``now_ts`` —
        :func:`kenshin_backup_spark.attime.parse_at_time` raises a clear
        error otherwise, keeping the engine clock-free."""
        from kenshin_backup_spark.attime import parse_at_time

        return parse_at_time(from_ts, now_ts), parse_at_time(until_ts, now_ts)

    def fetch(
        self,
        metric_glob: str | None,
        from_ts: int | str,
        until_ts: int | str,
        *,
        now_ts: int | None = None,
        kernel: str | None = None,
    ) -> DataFrame:
        """Reference ``fetch``: archive-routed, range-clamped, gap-filled
        values for every metric matching the glob, as one long frame
        ``(metric, bucket_ts, value, n_points)``. ``kernel`` defaults to
        each policy's configured aggregation. ``metric_glob=None`` fetches
        the whole catalog (tagged-metric selection needs this: ``*`` is a
        one-component glob and would drop dotted bare names).
        ``from_ts``/``until_ts`` also accept graphite's at-time strings
        (``'-24h'``, ``'now'``, ``'midnight'``, ``'17:00_20240115'`` … —
        see :mod:`kenshin_backup_spark.attime`); relative forms resolve
        against the injected ``now_ts``."""
        from_ts, until_ts = self._resolve_window(from_ts, until_ts, now_ts)
        if now_ts is None:
            now_ts = until_ts
        out: DataFrame | None = None
        for p in self.policies:
            if p.name not in self._written:
                continue
            raw = fetch_from_ladder(
                self.spark,
                self._ladder(p),
                metric_glob=metric_glob,
                from_ts=from_ts,
                until_ts=until_ts,
                now_ts=now_ts,
            )
            wide = finalize(raw, agg=kernel or p.agg, xff=p.xff)
            part = wide.select(
                "metric",
                F.col("bucket_ts").cast("long").alias("bucket_ts"),
                F.col("value"),
                F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("n_points"),
            )
            out = part if out is None else out.unionByName(part)
        if out is None:
            raise ValueError("fetch before any write")
        return out

    def render(
        self,
        target: str,
        from_ts: int | str,
        until_ts: int | str,
        *,
        now_ts: int | None = None,
        max_data_points: int | None = None,
        x_files_factor: float | None = None,
        memo: dict | None = None,
    ) -> DataFrame:
        """Evaluate a graphite render-target expression (the reference
        consumers' query language) over this store — e.g.
        ``summarize(scale({click,view}, 0.001), '1h', 'max')``. Leaves
        fetch through :meth:`fetch`; the whole nested expression compiles
        into one Catalyst plan (see :mod:`kenshin_backup_spark.render`).
        ``max_data_points`` applies graphite's pixel-budget consolidation
        (the ``maxDataPoints`` request parameter every Grafana panel
        sends; kernel and gap tolerance come from the target's
        ``consolidateBy``/``cumulative``/``xFilesFactor`` calls,
        threaded as evaluator state that survives renames — default
        average — see seriesfns.consolidate_points). ``from_ts``/
        ``until_ts`` also accept graphite at-time strings (``'-24h'``,
        ``'now'``, ``'midnight'`` …) resolved against ``now_ts`` — the
        full request-parameter surface a graphite consumer sends."""
        from kenshin_backup_spark.cache import persist_tracked
        from kenshin_backup_spark.render import render as _render

        from_ts, until_ts = self._resolve_window(from_ts, until_ts, now_ts)

        # Memoize + persist each distinct (glob, window) leaf fetch for the
        # duration of this render call. Two reasons, both measured (r15):
        # (a) render functions that rank/join a series frame back onto
        # itself duplicate the leaf SUBTREE in the final plan — a deep
        # target re-ran the archive scan+grid >100× per action; the persist
        # point makes Spark's cache manager substitute one InMemoryRelation
        # for every duplicate at execution. (b) each fetch_from_ladder plan
        # build costs driver-side file listing + py4j round-trips; the memo
        # pays it once per distinct glob instead of once per leaf
        # reference. Scope is ONE render request (series-count × window
        # buckets rows — dashboard-bounded); the registry wrapper clears
        # tracked persists between queries, so a long session never
        # accumulates render caches. A multi-target request (render_many,
        # or a caller unioning several renders of one dashboard panel)
        # passes ONE ``memo`` dict through every render so targets that
        # reference the same (glob, window, now) leaf share a single
        # fetch plan + persist instead of rebuilding it per target (r16;
        # graphite_render_group_order's two targets fetch the same two
        # globs). Same request-scoped lifetime — nothing outlives the
        # caller's request.
        if memo is None:
            memo = {}

        def _fetch_cached(glob: str | None, f: int, u: int, now: int | None) -> DataFrame:
            # ADVICE r15: the key includes the fetch's effective now.
            # Today every fetch in one render resolves to the same
            # eff_now (fetch() normalizes now_ts=None to until_ts ==
            # eff_now), so this entry is constant within a call — but a
            # future refetch rail passing a per-shift now must never
            # silently reuse a frame fetched under a different clock.
            key = (glob, f, u, now if now is not None else u)
            if key not in memo:
                memo[key] = self.fetch(glob, f, u, now_ts=now).select(
                    "metric", "bucket_ts", "value"
                ).transform(persist_tracked)
            return memo[key]

        def fetch_fn(glob: str | None) -> DataFrame:
            return _fetch_cached(glob, from_ts, until_ts, now_ts)

        # the request's effective "now": adjusted-window re-fetches must
        # clamp and route archives against the REAL request now, not the
        # sub-window's end (graphite's shifted requestContext copies keep
        # the true now; a past timeShift would otherwise route to a finer
        # archive than the original request could see)
        eff_now = now_ts if now_ts is not None else until_ts

        def refetch_fn(glob: str | None, f: int, u: int) -> DataFrame:
            # adjusted-window re-fetch for hitcount(alignToInterval),
            # linearRegression source windows, smartSummarize alignTo,
            # timeShift/timeStack and the holtWinters bootstrap — same
            # rail as fetch_fn, different bounds (r10); shares the memo
            # keyed on the adjusted window
            return _fetch_cached(glob, f, u, eff_now)

        # the request window also feeds the generator functions
        # (time/sin/randomWalk/constantLine/threshold) and events()
        return _render(
            target, fetch_fn,
            from_ts=from_ts, until_ts=until_ts,
            events_fn=self._events_fn,
            max_data_points=max_data_points,
            refetch_fn=refetch_fn,
            x_files_factor=x_files_factor,
        )

    def render_many(
        self,
        targets: list[str] | tuple[str, ...],
        from_ts: int | str,
        until_ts: int | str,
        *,
        now_ts: int | None = None,
        max_data_points: int | None = None,
        x_files_factor: float | None = None,
    ) -> DataFrame:
        """Evaluate SEVERAL render targets in one call — the shape of a
        real graphite render request (``&target=a&target=b...``); every
        dashboard panel sends one. Returns the union of the canonical
        frames with a ``target`` column carrying each row's source
        expression (graphite keys the response JSON the same way — two
        targets can legitimately emit the same series name, so the
        column is the disambiguator, mirroring graphite's per-target
        response entries).

        Scale: each target is an independent lazy plan; the union is
        plan-level, so Spark schedules all panels' scans/aggregations in
        one job with shared staging — no per-target driver round-trips;
        targets referencing the same (glob, window) leaf share ONE fetch
        plan + persist through the request-scoped memo (r16)."""
        if not targets:
            raise ValueError("render_many: need at least one target")
        from pyspark.sql import functions as F

        memo: dict = {}
        out: DataFrame | None = None
        for t in targets:
            part = self.render(
                t, from_ts, until_ts,
                now_ts=now_ts, max_data_points=max_data_points,
                x_files_factor=x_files_factor, memo=memo,
            ).select(
                F.lit(t).alias("target"), "metric", "bucket_ts", "value"
            )
            out = part if out is None else out.unionByName(part)
        return out

    def render_pie(
        self,
        target: str,
        from_ts: int | str,
        until_ts: int | str,
        *,
        pie_mode: str = "average",
        now_ts: int | None = None,
        x_files_factor: float | None = None,
        include_empty: bool = True,
        memo: dict | None = None,
    ) -> DataFrame:
        """graphite's PIE render — ``&graphType=pie&pieMode=...``
        collapses each series of the evaluated target to ONE number,
        the per-slice value of the pie chart (graphite-web
        render/views.py's pie branch over render/functions.py's
        ``PieFunctions``: average / maximum / minimum — the last
        render-API surface next to the line graph). Returns a
        ``(metric, value)`` frame, one row per series of the evaluated
        target.

        Kernels (gaps are the frame's NULL slots):

        - ``average`` — graphite's ``safeDiv(safeSum, safeLen)``: gaps
          ignored; an all-gap series yields a NULL slice (graphite emits
          ``None`` and the pie renderer skips it — the row is kept here
          by default so the caller sees the series existed; pass
          ``include_empty=False`` for graphite's skip-None rendering).
          CALLERS COMPUTING SLICE FRACTIONS (value / sum of values) must
          either pass ``include_empty=False`` or NULL-filter first — a
          NULL slice nulls a plain SUM total (ADVICE r11).
        - ``maximum`` / ``minimum`` — gap-ignoring max/min. Documented
          deviation: graphite-web 1.1's ``pieMinimum`` is python-2
          ``min()``, where ``None`` sorts below every number, so any
          single gap collapses the slice to None; here gaps are ignored
          (the safe semantics ``pieMaximum`` already has, and what the
          py3 line of graphite settled on).

        Literal slices: graphite's pie endpoint also accepts constant
        ``target=name:value`` slices — views.py treats ANY pie target
        containing ``:`` as a literal, splitting on the FIRST colon and
        raising on a non-numeric value; mirrored here (the row is a
        1-row plan that never touches the store).

        Scale: the reduction is one gap-ignoring aggregate per series
        keyed on the series name — a map-side-combined groupBy stacked
        on the render plan; no new shuffle beyond the render's own."""
        if pie_mode not in ("average", "maximum", "minimum"):
            raise ValueError(
                f"render_pie: unknown pieMode {pie_mode!r} "
                "(graphite accepts average, maximum, minimum)"
            )
        if ":" in target:
            name, _, raw = target.partition(":")
            try:
                value = float(raw)
            except ValueError:
                raise ValueError(
                    f"render_pie: invalid literal pie target {target!r} "
                    "(expected name:value)"
                ) from None
            return self.spark.range(1).select(
                F.lit(name).alias("metric"),
                F.lit(value).cast("double").alias("value"),
            )
        frame = self.render(
            target, from_ts, until_ts,
            now_ts=now_ts, x_files_factor=x_files_factor, memo=memo,
        )
        kernel = {"average": F.avg, "maximum": F.max, "minimum": F.min}[
            pie_mode
        ]
        slices = frame.groupBy("metric").agg(
            kernel("value").cast("double").alias("value")
        )
        if not include_empty:
            slices = slices.where(F.col("value").isNotNull())
        return slices

    def render_pie_many(
        self,
        targets: list[str] | tuple[str, ...],
        from_ts: int | str,
        until_ts: int | str,
        *,
        pie_mode: str = "average",
        now_ts: int | None = None,
        x_files_factor: float | None = None,
        include_empty: bool = True,
    ) -> DataFrame:
        """SEVERAL pie targets in one call — the shape of a real graphite
        pie request (``&graphType=pie&target=a&target=b...``): views.py
        walks the target list and appends every target's slices to ONE
        data list, so expression targets and literal ``name:value``
        slices mix freely and duplicate slice names are kept (graphite's
        pie data is a list, not a dict). Returns the union of the
        per-target ``(metric, value)`` frames — one lazy plan, scheduled
        as one job like :meth:`render_many`.

        NULL slices: unions AMPLIFY the all-gap case — one all-gap
        series in ANY target nulls a plain ``SUM(value)`` over the
        combined slice list. Pass ``include_empty=False`` (graphite's
        skip-None pie rendering, applied per target) or NULL-filter
        before totaling (ADVICE r11)."""
        if not targets:
            raise ValueError("render_pie_many: need at least one target")
        memo: dict = {}
        out: DataFrame | None = None
        for t in targets:
            part = self.render_pie(
                t, from_ts, until_ts,
                pie_mode=pie_mode, now_ts=now_ts,
                x_files_factor=x_files_factor,
                include_empty=include_empty,
                memo=memo,
            )
            out = part if out is None else out.unionByName(part)
        return out

    # -- maintenance ----------------------------------------------------------

    def delete(self, glob: str) -> dict[str, dict[int, int]]:
        """Delete every series matching ``glob`` from every written
        policy ladder — the reference's ``rm <metric>.wsp`` surface and
        the execute half of the GDPR erasure flow (``gdpr_erasure_audit``
        is the dry-run). Atomic per level (rewrite-to-temp + swap, same
        discipline as compaction); returns
        ``{policy: {step_seconds: rows_deleted}}`` as the erasure
        receipt."""
        from kenshin_backup_spark.functions.deterministic import glob_to_regex
        from kenshin_backup_spark.operators.ladder import delete_metrics

        exact = not any(ch in glob for ch in "*?{[")
        regex = glob_to_regex(glob)
        receipt: dict[str, dict[int, int]] = {}
        for p in self.policies:
            if p.name not in self._written:
                continue
            if exact:
                # exact-name deletes take the bucket-pruned path on a
                # bucketed ladder (and a plain isin rewrite on a flat one)
                receipt[p.name] = delete_metrics(
                    self.spark, self._ladder(p), metrics=[glob]
                )
            else:
                receipt[p.name] = delete_metrics(
                    self.spark, self._ladder(p), regex
                )
        return receipt

    # -- header / catalog -----------------------------------------------------

    def info(self, metric: str) -> dict:
        """Reference header read: the metric's policy and archive table."""
        p = self.policy_for(metric)
        return {
            "metric": metric,
            "policy": p.name,
            "aggregation": p.agg,
            "xff": p.xff,
            "archives": [
                {
                    "step_seconds": s,
                    "points": self._ppl,
                    "retention_seconds": s * self._ppl,
                }
                for s in p.steps
            ],
        }

    def metrics(self, glob: str = "*", *, limit: int = 100_000) -> list[str]:
        """Metric browse over everything written, filtered by glob.

        ONE unioned job across all written policies: the ``rlike`` filter
        sits under the distinct so Catalyst pushes it to each parquet scan,
        partial-aggregates dedupe map-side, and the driver materializes at
        most ``limit`` names (the graphite-finder contract returns a name
        list, so a driver-side list is inherent — the cap bounds it; raise
        ``limit`` or narrow the glob for bigger catalogs). Exact globs
        short-circuit to an equality predicate."""
        scans = []
        for p in self.policies:
            if p.name not in self._written:
                continue
            lad = self._ladder(p)
            finest = min(a.step_seconds for a in lad.archives)
            scans.append(
                self.spark.read.parquet(lad.level_path(finest)).select("metric")
            )
        if not scans:
            return []
        cat = scans[0]
        for s in scans[1:]:
            cat = cat.unionByName(s)
        cat = metric_filter(cat, "metric", glob)
        rows = cat.distinct().limit(limit).collect()
        return sorted(r.metric for r in rows)

    def _tag_pairs(self):
        """Distinct (tag, value) pairs across every written series'
        graphite-1.1 path (``name;tag=value;...``). One job: the catalog
        scan dedupes names map-side, tags explode from the tiny distinct
        name set — never from the point data."""
        from pyspark.sql import functions as F

        scans = []
        for p in self.policies:
            if p.name not in self._written:
                continue
            lad = self._ladder(p)
            finest = min(a.step_seconds for a in lad.archives)
            scans.append(
                self.spark.read.parquet(lad.level_path(finest)).select(
                    "metric"
                )
            )
        if not scans:
            return None
        cat = scans[0]
        for s in scans[1:]:
            cat = cat.unionByName(s)
        names = cat.distinct()
        pair = F.split(F.col("__kv"), "=", 2)
        return (
            names.select(
                F.explode(
                    F.slice(
                        F.split(F.col("metric"), ";"),
                        2,
                        F.greatest(
                            F.size(F.split(F.col("metric"), ";")) - 1,
                            F.lit(0),
                        ),
                    )
                ).alias("__kv")
            )
            .where(F.col("__kv").contains("="))
            .select(
                pair[0].alias("tag"),
                F.coalesce(pair[1], F.lit("")).alias("value"),
            )
            .distinct()
        )

    def tags(self, *, limit: int = 10_000) -> list[str]:
        """Graphite ``/tags`` catalog: the distinct tag KEYS present in
        any written series path (graphite-1.1 ``name;tag=value`` form).
        Untagged catalogs return ``[]``. Driver list bounded by
        ``limit`` (the graphite API returns a list; same inherent-list
        contract as :meth:`metrics`)."""
        pairs = self._tag_pairs()
        if pairs is None:
            return []
        rows = pairs.select("tag").distinct().limit(limit).collect()
        return sorted(r.tag for r in rows)

    def tag_values(self, tag: str, *, limit: int = 10_000) -> list[str]:
        """Graphite ``/tags/<tag>``: the distinct values recorded for one
        tag key across the catalog (driver list bounded by ``limit``)."""
        from pyspark.sql import functions as F

        pairs = self._tag_pairs()
        if pairs is None:
            return []
        rows = (
            pairs.where(F.col("tag") == tag)
            .select("value")
            .distinct()
            .limit(limit)
            .collect()
        )
        return sorted(r.value for r in rows)

    def find(
        self, query: str = "*", *, limit: int = 100_000
    ) -> list[tuple[str, bool, bool]]:
        """graphite ``/metrics/find`` tree browse: expand ``query`` ONE
        level and return ``(node_path, is_leaf, expandable)`` per distinct
        node — the finder contract graphite-web's tree UI actually calls
        (``metrics()`` is the flat-name variant). A node is a leaf when a
        metric with exactly the query's component count matches, and
        expandable when deeper metrics continue under it; both can be
        true (``cpu`` the metric and ``cpu.load`` coexisting).

        One job: the prefix regex is pushed into every written ladder's
        scan (same unioned-scan shape as :meth:`metrics`), the node path
        derives scan-side from the first N name components, and the two
        flags are a boolean aggregate per node. Driver materialization is
        ``limit``-capped like :meth:`metrics`."""
        depth = len(query.split("."))
        # full-name glob regex is ^...$; prefix form = same body, with the
        # tail anchored to "end of name OR a deeper component"
        body = glob_to_regex(query)[1:-1]
        prefix_rx = f"^(?:{body})(?:$|\\.)"
        scans = []
        for p in self.policies:
            if p.name not in self._written:
                continue
            lad = self._ladder(p)
            finest = min(a.step_seconds for a in lad.archives)
            scans.append(
                self.spark.read.parquet(lad.level_path(finest)).select("metric")
            )
        if not scans:
            return []
        cat = scans[0]
        for s in scans[1:]:
            cat = cat.unionByName(s)
        parts = F.split(F.col("metric"), r"\.")
        nodes = (
            cat.where(F.col("metric").rlike(prefix_rx))
            .select(
                F.concat_ws(".", F.slice(parts, 1, depth)).alias("node"),
                (F.size(parts) == depth).alias("leaf"),
                (F.size(parts) > depth).alias("expandable"),
            )
            .groupBy("node")
            .agg(
                F.max("leaf").alias("leaf"),
                F.max("expandable").alias("expandable"),
            )
            .limit(limit)
            .collect()
        )
        return sorted((r.node, bool(r.leaf), bool(r.expandable)) for r in nodes)

    # -- maintenance ----------------------------------------------------------

    def expire(self, *, now_ts: int) -> dict[str, dict[int, list[str]]]:
        """Drop date partitions older than each level's retention."""
        return {
            p.name: expire_retention(self._ladder(p), now_ts=now_ts)
            for p in self.policies
            if p.name in self._written
        }

    def compact(self) -> dict[str, dict[int, tuple[int, int]]]:
        """Compact every written level's small files; returns per-policy
        per-step (files_before, files_after)."""
        out: dict[str, dict[int, tuple[int, int]]] = {}
        for p in self.policies:
            if p.name not in self._written:
                continue
            lad = self._ladder(p)
            out[p.name] = {
                a.step_seconds: compact_level(self.spark, lad, a.step_seconds)
                for a in lad.archives
            }
        return out
