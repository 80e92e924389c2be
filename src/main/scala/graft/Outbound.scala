package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Delta
import graft.sources.Sinks

/** EP2 — the outbound datalake → document-store job (`PUSH`, SURVEY.md §3):
  * read the structured output, select only-new documents via the
  * coalesce-guarded anti join, cut lineage through a parquet stage, and
  * validate with the symmetric-MINUS reconciliation before hand-off.
  * The document-store write itself (`PUSH:349-350`) is connector config;
  * its semantics — the nested document shape — are what `staged` carries.
  */
object Outbound {

  final case class PushResult(docs: DataFrame, report: Delta.ReconcileReport)

  def push(spark: SparkSession, dir: String,
      stagePath: String = "/root/repo/target/stage/outbound"): PushResult = {
    // the pipeline output feeds the delta's both sides + validation:
    // persist instead of re-running the whole build per consumer
    val prospects = CacheScope.persist(Flagship.prospectPipeline(spark, dir))

    // runtime schema introspection before trusting the target collection
    // (`if 'leadid' in df_docdb.columns`, PUSH:206)
    val docdb = prospects
      .filter(col("leadid").cast("long") % 2 === 0)
      .select("leadid") // stand-in for the existing collection's keys
    require(docdb.columns.contains("leadid"), "target collection lacks leadid")

    // only-new delta (PUSH:207-224) + stage-out lineage cut (PUSH:227-229).
    // persist: the delta is consumed four times (stage write, reconcile's
    // src count, and both MINUS directions) — uncached, each re-runs the
    // anti-join over the full prospect frame
    val delta = CacheScope.persist(
      Delta.newKeysOnly(prospects, docdb, "leadid", "leadid", lit("")))
    val staged = Sinks.stageOut(spark, delta, stagePath)

    // validation block (PUSH:369-457): staged must equal the delta
    val report = Delta.reconcile(
      delta.select(col("leadid")), staged.select(col("leadid")))
    PushResult(staged, report)
  }
}
