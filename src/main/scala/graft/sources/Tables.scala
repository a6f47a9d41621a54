package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver testdata (TESTDATA.md): one parquet file per
  * table under `$sfDir/`.
  *
  * The only non-trivial read is `events`: its `ts` column is physical
  * TIMESTAMP(NANOS), which Spark 4.x refuses to read unless
  * `spark.sql.legacy.parquet.nanosAsLong=true`, after which the column
  * arrives as `long` nanoseconds and must be rebuilt to a microsecond
  * timestamp. We use integer division (`DIV`) rather than `/1000` so no
  * precision is lost converting the int64 nanos through a double
  * (2024-era nanos ≈ 1.7e18 > 2^53).
  *
  * At 100 TB these readers would pick up partitioned directories the same
  * way — `spark.read.parquet` on a directory of row-group-sized files with
  * hive-style partition columns enables partition pruning for free; nothing
  * here assumes a single file.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session settings the readers depend on (nanos-as-long for the events
    * TIMESTAMP(NANOS) column, UTC so date/timestamp functions are
    * engine-portable). Applied once per session — prefer setting these in
    * the SparkSession builder; this guard exists so a bare session still
    * reads correctly without per-read conf churn. */
  private def ensureConfigured(spark: SparkSession): Unit = {
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if (!spark.conf.getOption("spark.sql.session.timeZone").contains("UTC"))
      spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  /** Read one table as a DataFrame (events gets the ts rebuild). */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    ensureConfigured(spark)
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    else df
  }

  /** Register temp views for the named tables (all by default), so both
    * DataFrame-API operators and `spark.sql` queries see the same inputs. */
  def views(spark: SparkSession, sfDir: String, names: Seq[String] = all): Unit =
    names.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))

  /** Write `events` as a hive-partitioned parquet layout (dt=YYYY-MM-DD
    * directories) — the 100 TB layout: a time-ranged query prunes whole
    * date partitions at the scan (see [[eventsSincePartitioned]] and the
    * PartitionFilters plan assertion in PlanSpec). Testdata stays
    * read-only; callers pass a scratch `outDir`. */
  def writeEventsPartitioned(spark: SparkSession, sfDir: String,
      outDir: String): Unit =
    table(spark, sfDir, "events")
      .withColumn("dt", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("dt").parquet(outDir)

  /** Incremental read over the partitioned layout: the watermark predicate
    * lands on the PARTITION column, so pruning happens at file listing —
    * unneeded date directories are never opened (vs. row-group pruning on
    * the raw-nanos path of [[eventsSince]]). */
  def eventsSincePartitioned(spark: SparkSession, dir: String,
      watermark: java.time.LocalDate): DataFrame =
    spark.read.parquet(dir)
      .filter(col("dt") >= lit(java.sql.Date.valueOf(watermark)))

  /** JDBC table read (the reference's database storages, e.g. Postgres
    * tables, behind the same reader API). `options` passes through Spark
    * JDBC tuning — at scale ALWAYS set partitionColumn/lowerBound/
    * upperBound/numPartitions so the read is N parallel range scans
    * instead of one executor draining the whole table over one
    * connection; predicates on the partition column prune ranges. */
  def readJdbc(spark: SparkSession, url: String, table: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .options(options).load()

  /** JDBC table write. `mode` follows DataFrameWriter ("overwrite",
    * "append", …); batching is Spark's JDBC writer (per-partition
    * connections, `batchsize` rows per round trip via `options`). */
  def writeJdbc(df: DataFrame, url: String, table: String,
      mode: String = "overwrite",
      options: Map[String, String] = Map.empty): Unit =
    df.write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .options(options).mode(mode).save()

  /** Events at/after a watermark, with the predicate applied to the RAW
    * int64-nanos column *before* the timestamp rebuild, so it pushes down
    * into the parquet scan (row-group + page pruning). Filtering the
    * rebuilt `timestamp_micros(...)` column instead would defeat pushdown —
    * a full scan at 100 TB. */
  def eventsSince(spark: SparkSession, sfDir: String,
      watermark: java.time.Instant): DataFrame = {
    ensureConfigured(spark)
    val nanos = watermark.getEpochSecond * 1000000000L + watermark.getNano
    spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("ts") >= nanos)
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
  }
}
