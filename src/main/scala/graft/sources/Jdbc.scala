package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S4 — the relational (JDBC) source leg, as a real code path.
  *
  * The reference ingests SQL Server tables with
  * `spark.read.format("jdbc")` plus url/dbtable/user/password options
  * (reference `JDBC:88-90`), then snapshots the frame to parquet so every
  * downstream stage reads columnar data instead of hammering the database.
  * That pattern — JDBC scan once, snapshot, re-read — is reproduced here
  * verbatim against embedded Derby (`jdbc:derby:memory:`), the only
  * relational engine available in-process; the options and the read path
  * are identical to what a SQL Server URL would use.
  *
  * Scale posture: a single-connection JDBC read is a one-task bottleneck,
  * so `readPartitioned` always sets partitionColumn/lowerBound/upperBound/
  * numPartitions — Spark issues one range-predicated query per partition
  * and the scan parallelizes across executors. Bounds need not be tight
  * (they only split the range, never filter), so no pre-read max() query
  * is required. The parquet snapshot then bounds database load to exactly
  * one scan per job run regardless of how many downstream stages consume
  * the table.
  */
object Jdbc {
  val DerbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"

  /** In-memory Derby database scoped to this JVM: real JDBC wire path,
    * no external endpoint. */
  def memoryUrl(db: String): String = s"jdbc:derby:memory:$db;create=true"

  /** Load a DataFrame into a JDBC table (the test-fixture half: in prod
    * the table already exists server-side). Overwrite = drop + recreate,
    * so re-runs are idempotent. `columnTypes` pins DDL types where the
    * dialect default is wrong for round-tripping (Derby maps StringType
    * to CLOB, which can't be compared or indexed). */
  def seed(df: DataFrame, url: String, table: String,
      columnTypes: Option[String] = None): Unit = {
    val w = df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", DerbyDriver)
      .mode("overwrite")
    columnTypes.fold(w)(t => w.option("createTableColumnTypes", t)).save()
  }

  /** S4 scan: parallel JDBC read — one range-split query per partition on
    * a numeric key column. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", DerbyDriver)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .load()

  /** The full S4 pattern: JDBC scan → parquet snapshot → re-read
    * (`JDBC:88-90` + the reference's snapshot landing). Downstream reads
    * hit the columnar snapshot, not the database. */
  def snapshot(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int, stagePath: String): DataFrame =
    Sinks.stageOut(spark,
      readPartitioned(spark, url, table, partitionColumn, lowerBound,
        upperBound, numPartitions),
      stagePath)
}
