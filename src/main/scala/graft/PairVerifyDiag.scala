package graft

/** One-off diagnostic: run the PRODUCTION-shaped capped containment
  * query (the exact PairLegBench leg) with the Spark event log on, so
  * per-stage wall/task times can be read back out of the log — the
  * composed plan reads ~2.4× the sum of its probe-isolated stages and
  * the event log is the ground truth for where (round 15). Not part of
  * the bench protocol. Usage: `runMain graft.PairVerifyDiag <dir>`. */
object PairVerifyDiag {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/sf10x_docs"
    // relative to the working copy (the close scripts run benches from
    // cloned camps — an absolute path would silently write outside them)
    val logDir = new java.io.File("target/eventlog").getAbsolutePath
    new java.io.File(logDir).mkdirs()
    val spark = GraftSession.builder(s"local[${GraftSession.envCpus}]",
        GraftSession.envCpus)
      .config("spark.eventLog.enabled", "true")
      .config("spark.eventLog.dir", logDir)
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "64g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set(text.Dedup.VerifyBroadcastBytesKey,
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_BROADCAST_BYTES", "0"))
    val t0 = System.nanoTime()
    val n = CacheScope.scoped {
      text.Dedup.containmentPairsCapped(
        text.Dedup.shingles(sources.Tables.load(spark, dir, "documents")),
        threshold = 0.5, pairBudgetPerDoc = 16L).count()
    }
    println(f"""{"diag":"containment_capped","rows":$n,"secs":${(System.nanoTime() - t0) / 1e9}%.3f}""")
    spark.stop()
  }
}
