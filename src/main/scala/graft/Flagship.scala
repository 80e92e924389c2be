package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.functions.Scalars
import graft.operators._

/** Flagship end-to-end pipeline — the reference's main structured-prospect
  * build (`FULL:188-1450`, SURVEY.md §3 EP1) re-composed over the test
  * star schema (FIXTURES.md §c roles): decode star (stage1) → enum recodes
  * (stage2) → cascading dealer repair ladder (stage3-4) → ambiguous-name
  * suffixing (stage5+) → surrogate key → nested document assembly (the
  * outbound shape, `PUSH:239-345`).
  *
  * Every join is broadcast (dims are KB–MB); the fact is never shuffled
  * except by the final surrogate-key range partitioning — the same plan
  * shape survives a 1000-executor 100 TB run.
  */
object Flagship {

  def prospectPipeline(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val customer = Tables.load(spark, dir, "customer")
      .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal")
    val nation = Tables.load(spark, dir, "nation")
    val region = Tables.load(spark, dir, "region")
    val supplier = Tables.load(spark, dir, "supplier")
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")

    // stage1 — decode star (FULL:331-505): stringmap dim + broadcast joins.
    val stringmap =
      nation.select(lit("nation_name").as("attributename"),
        col("n_nationkey").cast("string").as("attributevalue"),
        col("n_name").as("value"))
      .unionByName(region.select(lit("region_name").as("attributename"),
        col("r_regionkey").cast("string").as("attributevalue"),
        col("r_name").as("value")))
    val stage1 = {
      val f = orders
        .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"), "left")
        .join(broadcast(nation.select("n_nationkey", "n_regionkey")),
          col("c_nationkey") === col("n_nationkey"), "left")
        .withColumn("c_nationkey_s", col("c_nationkey").cast("string"))
        .withColumn("n_regionkey_s", col("n_regionkey").cast("string"))
      DecodeJoin.decodeStar(f, stringmap, Seq(
        ("nation_name", "c_nationkey_s", "nation_name"),
        ("region_name", "n_regionkey_s", "region_name")))
        .drop("c_nationkey_s", "n_regionkey_s", "n_nationkey", "n_regionkey")
    }

    // stage2 — enum recodes (FULL:599-645) + default fill (FULL:497-500).
    val stage2 = Scalars.defaultFill(
      stage1
        .withColumn("channel", Scalars.caseLadder(col("o_orderpriority"),
          Seq("1-URGENT" -> "DIRECT", "2-HIGH" -> "DEALER", "3-MEDIUM" -> "WEB"),
          lit("OTHER")))
        .withColumn("prospect_type", Scalars.caseLadder(col("o_orderstatus"),
          Seq("F" -> "CLOSED", "O" -> "OPEN"), lit("PENDING")))
        .withColumn("created_date", Scalars.ddMMyyyy(col("o_orderdate"))),
      Map("c_name" -> lit("UNKNOWN"), "c_mktsegment" -> lit("NA")))

    // stage3-4 — cascading dealer repair ladder (FULL:738-1057).
    val base = stage2.withColumn("k1", col("o_custkey") % 150)
    val repaired = RepairJoin(base, "o_orderkey", supplier,
      dimCols = Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
      rounds = Seq(
        (b, d) => d("s_suppkey") === b("k1") && d("s_nationkey") === b("c_nationkey"),
        (b, d) => d("s_suppkey") === b("k1")),
      dedupOrder = Seq(col("s_acctbal").desc, col("s_suppkey")),
      defaults = Map(
        "s_suppkey" -> lit(-1L), "s_name" -> lit("DEFAULT"),
        "s_nationkey" -> lit(-1), "s_acctbal" -> lit(0.0)))

    // surrogate key (FULL:413) — scalable form, no global sort.
    val keyed = TopK.surrogateKeyScalable(repaired, col("o_orderkey"),
      "PM", 9, "prospect_id")

    // nested document (PUSH:239-345) + final select (FULL:1352-1439).
    val doc = keyed.select(
      col("prospect_id"),
      col("o_orderkey").cast("string").as("leadid"),
      struct(
        col("channel"), col("created_date").as("createdDate"),
        col("o_orderpriority").as("sourceCode")).as("administration"),
      struct(
        col("c_name").as("name"), col("c_mktsegment").as("segment"),
        col("nation_name").as("nation"), col("region_name").as("region"),
        col("c_acctbal").as("balance")).as("customerDetails"),
      struct(
        col("s_suppkey").as("dealerCode"), col("s_name").as("dealerName"),
        col("s_acctbal").as("dealerScore")).as("dealerDetails"),
      struct(
        col("o_totalprice").as("totalPrice"),
        col("o_orderstatus").as("status"),
        col("prospect_type").as("prospectType")).as("purchaseDetails"),
      struct(Documents.questionnaire(Seq(
        "QM004" -> Seq(col("c_mktsegment")),
        "QM005" -> Seq(col("o_orderpriority"), col("o_orderstatus"))
      )).as("interests")).as("enrollmentDetails"))
    Documents.nullifyStructWhen(doc, "enrollmentDetails",
      col("purchaseDetails.status") === lit("O"))
  }
}
