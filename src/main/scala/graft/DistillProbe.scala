package graft

import org.apache.spark.sql.functions._

/** Hyper-parameter probe for `Distill.distillGate` — accuracy vs the
  * majority-class base rate across (iters, lr) on a fixture dir.
  * Diagnostics only: `runMain graft.DistillProbe [dir]`. */
object DistillProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.local(GraftSession.envCpus)
    val docs = sources.Tables.load(spark, dir, "documents")
    val gate = text.TextAnalysis.gopherMetrics(10, 1000, 2.0, 10.0, 0.2, 0.2).last
    for ((it, lr) <- Seq((20, 16.0))) {
      CacheScope.scoped {
        val out = text.Distill.distillGate(docs, gate, dim = 64,
          iters = it, lr = lr)
        val r = out.agg(avg(col("label")), avg(col("correct")),
          avg(col("predicted"))).head()
        println(f"""{"distill_probe":{"iters":$it,"lr":$lr,"pos_rate":${r.getDouble(0)}%.4f,"acc":${r.getDouble(1)}%.4f,"pred_rate":${r.getDouble(2)}%.4f}}""")
      }
    }
    spark.stop()
  }
}
