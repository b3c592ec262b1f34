"""Streaming observability — the Grafana/Prometheus monitoring analog.

The reference ships a monitoring stack for its CDC pipelines
(``infrastructure/apps/monitoring``, dashboards over Kafka/connect lag
and job health). On Spark, the native signal is the
StreamingQueryListener progress event: rows/sec, batch durations,
state-store size, watermark lag. This module captures those events
into plain records a dashboard (or a catalog table) can read.

Design: the listener only appends to an in-memory list (listener
callbacks run on the driver's listener bus — they must never run Spark
jobs themselves or they deadlock). ``snapshot_metrics`` converts the
buffer to a DataFrame on demand; ``save_metrics`` persists it through
the catalog.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

METRICS_SCHEMA = (
    "query_id string, run_id string, name string, batch_id long, "
    "timestamp string, num_input_rows long, input_rows_per_second double, "
    "process_rows_per_second double, batch_duration_ms long, "
    "state_rows long, watermark string"
)


class MetricsListener(StreamingQueryListener):
    """Buffers one record per micro-batch progress event."""

    def __init__(self):
        self.records: list[tuple] = []

    # -- StreamingQueryListener interface --------------------------------
    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = json.loads(event.progress.json)
        state_rows = 0
        for op in p.get("stateOperators", []) or []:
            state_rows += op.get("numRowsTotal", 0) or 0
        duration = (p.get("durationMs") or {}).get("triggerExecution")
        self.records.append(
            (
                p.get("id"),
                p.get("runId"),
                p.get("name"),
                p.get("batchId"),
                p.get("timestamp"),
                p.get("numInputRows"),
                float(p.get("inputRowsPerSecond") or 0.0),
                float(p.get("processedRowsPerSecond") or 0.0),
                int(duration) if duration is not None else None,
                state_rows,
                (p.get("eventTime") or {}).get("watermark"),
            )
        )

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass


def attach_metrics_listener(spark: SparkSession) -> MetricsListener:
    listener = MetricsListener()
    spark.streams.addListener(listener)
    return listener


def snapshot_metrics(spark: SparkSession, listener: MetricsListener) -> DataFrame:
    """Buffered progress events as a DataFrame (safe to call any time
    from the main thread — never from inside the listener)."""
    return spark.createDataFrame(listener.records, METRICS_SCHEMA)


def save_metrics(spark, catalog, listener: MetricsListener, table: str = "_stream_metrics"):
    """Persist the metrics buffer to a catalog table (append)."""
    df = snapshot_metrics(spark, listener)
    return catalog.write(table, df, mode="append")


def streaming_data_card(sdf: DataFrame, text_col: str = "text") -> DataFrame:
    """Streaming twin of :func:`~konohadataplatform_spark.operators.
    text.data_card`: cumulative corpus datasheet numbers over an
    UNBOUNDED document stream (run with ``outputMode("complete")``) —
    the live ingest dashboard row a pipeline operator watches while a
    crawl lands.

    Exact where streaming state allows (doc/token/char totals are
    plain running sums) and approximate where the batch op used
    COUNT(DISTINCT): streaming aggregation cannot hold unbounded
    distinct sets, so lang/source/text cardinalities are
    ``approx_count_distinct`` (HLL++, bounded state) — the columns are
    suffixed ``_approx`` so nobody mistakes them for the batch-exact
    figures. State is ONE row of counters + three HLL sketches,
    regardless of stream length.
    """
    toks = F.split(F.trim(F.col(text_col)), " ")
    return sdf.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(text_col).alias("n_with_text"),
        F.sum(
            F.when(F.col(text_col).isNotNull(), F.size(toks)).otherwise(
                F.lit(0)
            )
        ).alias("total_tokens"),
        F.sum(
            F.coalesce(F.length(text_col).cast("long"), F.lit(0))
        ).alias("total_chars"),
        F.approx_count_distinct("lang").alias("n_langs_approx"),
        F.approx_count_distinct("source").alias("n_sources_approx"),
        F.approx_count_distinct(
            F.md5(F.col(text_col).cast("binary"))
        ).alias("n_distinct_texts_approx"),
    )
