"""Pluggable change-event stream sources.

Round-1 review: the file-tail stand-in was hard-wired into ``IngestJob``,
so the "swap in Kafka later" promise was not an isolated change. This
module is the seam: a source exposes exactly two things —

- ``discover_schema() -> StructType``: the event envelope schema, known
  BEFORE the stream starts (explicit schemas everywhere; no inference on
  the hot path, SURVEY §1.3);
- ``read_stream(spark, schema) -> DataFrame``: a streaming DataFrame of
  change events. Spark's checkpointed offset log (T2) works identically
  for any source — offsets are file positions for the file source and
  (topic, partition, offset) ranges for Kafka.

``FileStreamSource`` is the sandbox realization (no Kafka jar exists
here — verified SURVEY §7.4.1). ``KafkaStreamSource`` carries the full
plan construction for a real deployment and fails loudly with the exact
spark-submit flags needed when the connector jar is absent."""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import pyarrow.parquet as pq
import pyarrow.types as patypes

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.pandas.types import from_arrow_type
from pyspark.sql.types import StructField, StructType


@dataclass
class FileStreamSource:
    """Binlog/WAL stand-in: an append-only directory of parquet event
    segments tailed by Spark's file stream source (exactly-once offsets
    via ``checkpointLocation``, SURVEY §2.1 S2)."""

    events_dir: str
    max_files_per_trigger: int = 8

    def discover_schema(self) -> StructType:
        """Additive union of all segment footers (driver-side, O(#files)).

        Upstream drift is caught LOUDLY: if two segments disagree on a
        column's type (beyond timezone normalization), this raises instead
        of silently reading the later segment with the first-seen type."""
        files = sorted(f for f in os.listdir(self.events_dir) if f.endswith(".parquet"))
        if not files:
            raise FileNotFoundError(f"no event segments under {self.events_dir}")
        fields: dict[str, StructField] = {}
        seen_arrow: dict[str, tuple[object, str]] = {}
        order: list[str] = []
        for f in files:
            sch = pq.ParquetFile(os.path.join(self.events_dir, f)).schema_arrow
            for af in sch:
                atype = (
                    af.type.remove_timezone()
                    if patypes.is_timestamp(af.type) and af.type.tz
                    else af.type
                )
                if af.name not in fields:
                    fields[af.name] = StructField(af.name, from_arrow_type(atype), True)
                    seen_arrow[af.name] = (atype, f)
                    order.append(af.name)
                elif seen_arrow[af.name][0] != atype:
                    first_t, first_f = seen_arrow[af.name]
                    raise TypeError(
                        f"event schema drift on column {af.name!r}: segment "
                        f"{first_f} has {first_t}, segment {f} has {atype} — "
                        "upstream type changes are not additive evolution; "
                        "fix the producer or route the segment to quarantine"
                    )
        return StructType([fields[n] for n in order])

    def read_stream(self, spark: SparkSession, schema: StructType) -> DataFrame:
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", self.max_files_per_trigger)
            .parquet(self.events_dir)
        )


@dataclass
class KafkaStreamSource:
    """Kafka binlog tail for real deployments (Debezium-style JSON
    envelopes). The envelope schema cannot be inferred from a byte stream,
    so it is declared up front (`event_schema`), mirroring a schema
    registry fetch. Requires the spark-sql-kafka connector jar, absent in
    this sandbox — construction-time checks keep the failure actionable."""

    bootstrap_servers: str
    topic: str
    event_schema: StructType
    starting_offsets: str = "earliest"
    max_offsets_per_trigger: int | None = None
    options: dict[str, str] = field(default_factory=dict)

    def discover_schema(self) -> StructType:
        return self.event_schema

    def read_stream(self, spark: SparkSession, schema: StructType) -> DataFrame:
        # Classpath pre-flight (round-2 advice fix): only a genuine
        # ClassNotFound means "connector missing". Under Spark Connect
        # (_jvm absent) or any unrelated JVM error we FALL THROUGH and let
        # Spark's own reader surface the real failure, instead of
        # mislabeling everything as a missing jar.
        jvm = getattr(spark, "_jvm", None)
        if jvm is not None:
            try:
                jvm.java.lang.Class.forName(
                    "org.apache.spark.sql.kafka010.KafkaSourceProvider"
                )
            except Exception as e:
                if "ClassNotFoundException" in str(e):
                    raise RuntimeError(
                        "Kafka connector not on the classpath. Launch with "
                        "`spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>` "
                        "(or place the jar in $SPARK_HOME/jars). Everything else — "
                        "checkpointing, fencing, MERGE — is source-agnostic."
                    ) from e
                # unrelated JVM error: let the reader below report it
        reader = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap_servers)
            .option("subscribe", self.topic)
            .option("startingOffsets", self.starting_offsets)
        )
        if self.max_offsets_per_trigger:
            reader = reader.option("maxOffsetsPerTrigger", self.max_offsets_per_trigger)
        for k, v in self.options.items():
            reader = reader.option(k, v)
        raw = reader.load()
        # value bytes -> typed envelope; malformed JSON -> null columns ->
        # merge_batch's validate leg quarantines them (S3)
        return raw.select(
            F.from_json(F.col("value").cast("string"), schema).alias("_e")
        ).select("_e.*")
