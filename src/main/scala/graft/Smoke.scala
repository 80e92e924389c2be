package graft

import org.apache.spark.sql.SparkSession

/** Smoke main mirroring the driver's t1 check: `SparkEntry.entry` at
  * sf0.001 must return >0 rows. Prints the count and a schema line. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows=$n")
    df.printSchema()
    df.show(3, truncate = 60)
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
