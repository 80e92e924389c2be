package graft



/** Smoke main mirroring the driver's t1 check: `SparkEntry.entry` at
  * sf0.001 must return >0 rows. Prints the count and a schema line. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(GraftSession.envCpus)
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows=$n")
    df.printSchema()
    df.show(3, truncate = 60)
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
