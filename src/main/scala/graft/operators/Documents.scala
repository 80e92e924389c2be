package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** F17/F18 — nested-document assembly (SURVEY.md §7 step 6).
  *
  * The reference's outbound job builds a 6-struct nested document from
  * flat columns in one select (`PUSH:239-343`) — `struct(... AS name)`,
  * `array(struct(...))` questionnaire synthesis (`FULL:653-699`) — and
  * conditionally nullifies a whole struct by prospect type
  * (`PUSH:344-345`). All of it is expression-level (`struct`, `array`,
  * `when`): columnar, codegen'd, no shuffle — nested assembly is free at
  * any scale.
  */
object Documents {

  /** `array(struct('Qxxx' questionId, array(coalesce(x,'')) response), …)`
    * — the questionnaire shape of `FULL:659-696`. */
  def questionnaire(entries: Seq[(String, Seq[Column])]): Column =
    array(entries.map { case (qid, resp) =>
      struct(
        lit(qid).as("questionId"),
        array(resp.map(c => coalesce(c, lit(""))): _*).as("response"))
    }: _*)

  /** F18: nullify a struct column when `cond` holds (`PUSH:344-345`). */
  def nullifyStructWhen(df: DataFrame, structCol: String, cond: Column): DataFrame =
    df.withColumn(structCol,
      when(cond, lit(null).cast(df.schema(structCol).dataType))
        .otherwise(col(structCol)))

  /** Assemble the prospect-style document over the orders⋈customer roles
    * (FIXTURES.md §c): six named structs mirroring `PUSH:241-339`. Input
    * must carry the flat columns referenced below. */
  def prospectDocument(flat: DataFrame): DataFrame = {
    val doc = flat.select(
      col("o_orderkey").cast("string").as("leadid"),
      struct(
        col("channel").as("channel"),
        col("created_date").as("createdDate"),
        col("o_orderpriority").as("sourceCode")).as("administration"),
      struct(
        col("c_name").as("name"),
        col("c_mktsegment").as("segment"),
        col("c_acctbal").as("balance")).as("customerDetails"),
      struct(
        col("o_totalprice").as("totalPrice"),
        col("o_orderstatus").as("status")).as("purchaseDetails"),
      struct(
        questionnaire(Seq(
          "QM004" -> Seq(col("c_mktsegment")),
          "QM005" -> Seq(col("o_orderpriority"), col("o_orderstatus"))
        )).as("interests")).as("enrollmentDetails"))
    // F18: open orders carry no enrollment yet (parity with the
    // prospectType-conditioned nullification, PUSH:344-345).
    nullifyStructWhen(doc, "enrollmentDetails",
      col("purchaseDetails.status") === lit("O"))
  }
}
