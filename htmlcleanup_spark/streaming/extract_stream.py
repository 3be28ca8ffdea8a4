"""Structured Streaming variant of the extract job.

The cascade is stateless per document, so the streaming plan is the batch
plan minus the global dedup window: readStream (file source or Kafka-shaped)
-> Arrow-batched cascade -> writeStream with checkpointing.  Exactly-once
lands via the sink's checkpoint + idempotent MERGE key (url, warc_ts).

Late recrawls are handled downstream: either a watermarked
``dropDuplicatesWithinWatermark`` on url (bounded state) here, or the batch
MERGE keeps the latest warc_ts at the table level.  We default to the MERGE
semantics because an unbounded per-url window is state the 10^12-doc scale
can't hold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..engine.rules import DEFAULT_RULES, RuleConfig
from ..functions.udf import RESULT_DDL, make_cascade_fn
from ..sources.pages import PAGES_SCHEMA


def stream_pages(spark: SparkSession, source_dir: str,
                 max_files_per_trigger: int = 16) -> DataFrame:
    """File-source stream over a growing pages parquet directory."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def extract_stream(pages: DataFrame, rules: RuleConfig = DEFAULT_RULES,
                   watermark_dedup: bool = False) -> DataFrame:
    """The streaming extract transform (stateless map; optional bounded
    url-dedup with a 1-hour watermark)."""
    df = pages.select("url", "warc_ts", "html", "lang")
    if watermark_dedup:
        df = df.withWatermark("warc_ts", "1 hour").dropDuplicatesWithinWatermark(
            ["url"]
        )
    return df.mapInArrow(make_cascade_fn(rules), RESULT_DDL)


def run_extract_stream(spark: SparkSession, source_dir: str, output_dir: str,
                       checkpoint_dir: str, available_now: bool = True,
                       rules: RuleConfig = DEFAULT_RULES):
    """Start (and with available_now=True, drain) the streaming job.

    Returns the StreamingQuery.  available_now processes the current backlog
    and stops — the incremental-batch mode used for catch-up runs and tests.
    """
    result = extract_stream(stream_pages(spark, source_dir), rules)
    writer = (
        result.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
