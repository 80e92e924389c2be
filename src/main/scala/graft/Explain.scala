package graft



/** Plan-inspection main: prints `.explain("formatted")` for the named
  * queries (or all) — the scale-review loop: check pushdown, broadcast
  * choices, and shuffle counts before trusting a plan at 100 TB. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    val wanted = if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted else args.toSeq
    wanted.foreach { name =>
      println(s"\n===== $name =====")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      // the flagship's SemDeDup assignment dispatches two-level only
      // past the measured n·k work budget, so the registered plan at a
      // test sf is the (correct) flat pass; print the FORCED two-level
      // twin too — output is provably identical (Round12Spec), this is
      // the 100 TB plan shape
      if (name == "q_flagship_curation") {
        println(s"\n===== $name [forceTwoLevel] =====")
        Flagship.curationPipeline(spark, sfDir, forceTwoLevel = true)
          .explain("formatted")
      }
    }
    spark.stop()
  }
}
