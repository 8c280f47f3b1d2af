"""Relational-database extract source — the per-step DB reader seam.

The reference genre's job/step configs read warehouse extracts straight
from relational databases; this sandbox has no DB server or JDBC driver
jar, so — exactly like ``streaming.sources.KafkaStreamSource`` — this
class carries the FULL plan construction for a real deployment and fails
loudly with the exact spark-submit flags when the driver jar is absent.
Everything downstream (MERGE, snapshots, lineage) is source-agnostic.

Scale posture baked into the plan:

- **Partitioned parallel read**: ``partition_column`` + bounds +
  ``num_partitions`` split the extract into range-predicate queries that
  run concurrently across executors. An unpartitioned JDBC read is ONE
  task pulling the whole table through one connection — never acceptable
  at warehouse scale, so bounds are REQUIRED whenever a partition column
  is given, and a single-connection read must be asked for explicitly
  (num_partitions=1, no partition column).
- **Predicate pushdown to the database**: the incremental watermark
  (``watermark_column`` > last committed value) is injected into the
  pushed-down subquery, so a CDC-style incremental step ships only new
  rows over the wire — the database does the filtering, not Spark.
- **Explicit schema everywhere**: ``expected_schema`` is validated
  against what the JDBC reader reports at plan time; upstream DDL drift
  fails loudly at the step boundary instead of corrupting the merge
  (same contract as FileStreamSource.discover_schema).
"""

from __future__ import annotations

import math

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def sql_literal(value) -> str:
    """Render a watermark value as a portable SQL literal.

    Python ``repr`` is NOT SQL (a string containing a quote becomes a
    Python-style double-quoted literal) and unescaped values are an
    injection surface inside the generated subquery — round-3 ADVICE.
    Numbers pass through; strings get single quotes doubled; anything
    else (including bool — ints in Python, not portable SQL) is rejected
    loudly at the step boundary."""
    if isinstance(value, bool) or not isinstance(value, (int, float, str)):
        raise TypeError(
            f"unsupported watermark literal type {type(value).__name__!r}: "
            "pass an int, float, or str (format timestamps as ISO strings)"
        )
    if isinstance(value, str):
        return "'" + value.replace("'", "''") + "'"
    if isinstance(value, float) and not math.isfinite(value):
        # repr(inf)/repr(nan) render as bare inf/nan — invalid SQL that
        # would fail at the DATABASE, not at this step boundary where the
        # contract promises loud rejection
        raise TypeError(
            f"non-finite float watermark {value!r} cannot be rendered as a "
            "SQL literal"
        )
    return repr(value)


@dataclass
class JdbcSource:
    """One job-step relational extract (``spark.read.format("jdbc")``).

    ``table`` may be a table name or a parenthesized subquery alias
    (``"(SELECT ... ) src"``) — the standard JDBC-source pushdown shape.
    """

    url: str  # jdbc:postgresql://host:5432/db etc.
    table: str
    expected_schema: StructType
    driver: str | None = None  # e.g. org.postgresql.Driver
    partition_column: str | None = None
    lower_bound: int | None = None
    upper_bound: int | None = None
    num_partitions: int = 1
    fetch_size: int = 10_000
    watermark_column: str | None = None
    options: dict[str, str] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.partition_column is not None and (
            self.lower_bound is None or self.upper_bound is None
        ):
            raise ValueError(
                "partition_column requires lower_bound and upper_bound: without "
                "them Spark cannot split the extract and the read collapses to "
                "one connection pulling the whole table"
            )
        if self.partition_column is None and self.num_partitions > 1:
            raise ValueError(
                "num_partitions > 1 needs a partition_column — Spark ignores it "
                "otherwise and the read silently runs on one connection"
            )

    def discover_schema(self) -> StructType:
        return self.expected_schema

    def effective_table(self, watermark_after=None) -> str:
        """The dbtable string actually sent to the database — with the
        incremental watermark predicate pushed into a subquery when
        ``watermark_after`` is given (tested without a live DB)."""
        if watermark_after is None:
            return self.table
        if self.watermark_column is None:
            raise ValueError("watermark_after given but watermark_column is unset")
        inner = self.table if " " not in self.table else f"({self.table}) _t"
        # pushed-down incremental predicate: the DB filters, not Spark
        return (
            f"(SELECT * FROM {inner} WHERE {self.watermark_column} > "
            f"{sql_literal(watermark_after)}) _incr"
        )

    def _reader(self, spark: SparkSession, watermark_after=None):
        table = self.effective_table(watermark_after)
        reader = (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", table)
            .option("fetchsize", self.fetch_size)
        )
        if self.driver:
            reader = reader.option("driver", self.driver)
        if self.partition_column is not None:
            reader = (
                reader.option("partitionColumn", self.partition_column)
                .option("lowerBound", self.lower_bound)
                .option("upperBound", self.upper_bound)
                .option("numPartitions", self.num_partitions)
            )
        for k, v in self.options.items():
            reader = reader.option(k, v)
        return reader

    def read(self, spark: SparkSession, watermark_after=None) -> DataFrame:
        """Build the extract DataFrame (lazy — no DB round trip yet) and
        validate the reported schema against ``expected_schema``."""
        try:
            df = self._reader(spark, watermark_after).load()
        except Exception as e:
            msg = str(e)
            if "ClassNotFoundException" in msg or "No suitable driver" in msg:
                raise RuntimeError(
                    f"JDBC driver {self.driver or '(unset)'} not on the classpath. "
                    "Launch with `spark-submit --packages <groupId>:<driver-artifact>:<version>` "
                    "(e.g. org.postgresql:postgresql:42.7.3) or place the driver jar "
                    "in $SPARK_HOME/jars, and set JdbcSource.driver to the class name. "
                    "Everything downstream — MERGE, snapshots, lineage — is "
                    "source-agnostic."
                ) from e
            raise
        got = {f.name: f.dataType for f in df.schema.fields}
        want = {f.name: f.dataType for f in self.expected_schema.fields}
        missing = sorted(set(want) - set(got))
        drifted = sorted(n for n in want.keys() & got.keys() if want[n] != got[n])
        if missing or drifted:
            raise TypeError(
                f"JDBC extract schema drift vs declared contract: missing columns "
                f"{missing}, type drift on {drifted} — fix the upstream DDL or the "
                "declared expected_schema; refusing to feed a drifted extract into "
                "the merge"
            )
        return df.select(*[f.name for f in self.expected_schema.fields])


_IDENT_RE = __import__("re").compile(r"^[A-Za-z_][A-Za-z0-9_$]*(\.[A-Za-z_][A-Za-z0-9_$]*)?$")


@dataclass
class JdbcWarehouseSink:
    """Warehouse LOAD seam — the write twin of :class:`JdbcSource`.

    The reference genre's load steps land transform outputs in relational
    warehouses. A naive ``df.write.jdbc(mode="overwrite")`` drops and
    reloads the LIVE table — readers see an empty or half-loaded table for
    the duration of the load. This sink implements the standard
    **staged-write + atomic-swap** pattern instead:

    1. ``write()`` loads the DataFrame into a STAGING table (parallel
       partitioned insert, one DB connection per partition, bounded by
       ``num_partitions``; ``batchsize`` batches the inserts);
    2. the returned ``swap_statements()`` — a transactional rename swap —
       are executed by the caller through the warehouse's OWN client
       (psql etc.): readers atomically flip from the old table to the
       fully-loaded one. DDL cannot ride the Spark JDBC writer, which is
       why the swap is handed back instead of executed here.

    No DB server or driver jar exists in this sandbox; like JdbcSource,
    the full plan construction is tested and the driver-missing failure
    is actionable (exact spark-submit flags).
    """

    url: str
    table: str
    staging_table: str | None = None  # default: {table}__stg
    driver: str | None = None
    batch_size: int = 10_000
    num_partitions: int | None = None  # bound on concurrent DB connections
    options: dict[str, str] = field(default_factory=dict)

    def __post_init__(self) -> None:
        self.staging_table = self.staging_table or f"{self.table}__stg"
        for ident in (self.table, self.staging_table):
            if not _IDENT_RE.match(ident):
                raise ValueError(
                    f"unsafe table identifier {ident!r}: the swap DDL interpolates "
                    "it — only [A-Za-z0-9_$] identifiers (optionally schema-"
                    "qualified) are accepted"
                )

    def swap_statements(self) -> list[str]:
        """The atomic publish, run via the warehouse's own client after a
        successful staged load. Transactional rename swap (Postgres-style;
        adjust RENAME syntax per dialect)."""
        t, stg, old = self.table, self.staging_table, f"{self.table}__old"
        return [
            "BEGIN",
            f"DROP TABLE IF EXISTS {old}",
            f"ALTER TABLE IF EXISTS {t} RENAME TO {old.split('.')[-1]}",
            f"ALTER TABLE {stg} RENAME TO {t.split('.')[-1]}",
            "COMMIT",
            f"DROP TABLE IF EXISTS {old}",
        ]

    def _writer(self, df: DataFrame):
        if self.num_partitions is not None:
            df = df.repartition(self.num_partitions)
        w = (
            df.write.format("jdbc")
            .option("url", self.url)
            .option("dbtable", self.staging_table)
            .option("batchsize", self.batch_size)
            .option("truncate", "false")
            .mode("overwrite")  # staging table only — never the live one
        )
        if self.driver:
            w = w.option("driver", self.driver)
        for k, v in self.options.items():
            w = w.option(k, v)
        return w

    def write(self, df: DataFrame) -> list[str]:
        """Run the staged load; returns the swap statements to publish."""
        try:
            self._writer(df).save()
        except Exception as e:
            msg = str(e)
            if "ClassNotFoundException" in msg or "No suitable driver" in msg:
                raise RuntimeError(
                    f"JDBC driver {self.driver or '(unset)'} not on the classpath. "
                    "Launch with `spark-submit --packages <groupId>:<driver-artifact>:<version>` "
                    "(e.g. org.postgresql:postgresql:42.7.3) or place the driver jar "
                    "in $SPARK_HOME/jars, and set JdbcWarehouseSink.driver. The "
                    "staged-write + swap plan is independent of the driver."
                ) from e
            raise
        return self.swap_statements()


def avro_reader(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Avro batch reader seam (explicit schema, like every other source).

    The ``spark-avro`` module is an external jar, absent in this sandbox;
    the failure is made actionable the same way as the Kafka and JDBC
    seams. ORC/CSV/JSON/parquet need no seam — they are built in and
    round-trip-proven by the ``source_format_roundtrip`` driver query."""
    try:
        return spark.read.format("avro").schema(schema).load(path)
    except Exception as e:
        msg = str(e)
        if "avro" in msg.lower() and ("Failed to find data source" in msg or "ClassNotFound" in msg):
            raise RuntimeError(
                "spark-avro is not on the classpath. Launch with `spark-submit "
                "--packages org.apache.spark:spark-avro_2.13:<spark-version>` "
                "(or place the jar in $SPARK_HOME/jars)."
            ) from e
        raise
