package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J1/A4 — the stringmap decode-join star (SURVEY.md §2c).
  *
  * The reference decodes enum codes by LEFT-joining 7 `select distinct
  * attributevalue, value from stringmapbase where attributename='…'` CTEs
  * onto the fact (`FULL:331-476`). Each decode dim is tiny → broadcast;
  * the star is a chain of broadcast-hash joins over a single fact scan,
  * no shuffle of the fact at any width. Distinct-before-join (J4) is
  * applied on the dim side only, where it is cheap.
  */
object DecodeJoin {

  /** Build a decode dim from a key/value table: the
    * `stringmapbase`-shaped `(attributename, attributevalue, value)`. */
  def decodeDim(stringmap: DataFrame, attributeName: String): DataFrame =
    stringmap.filter(col("attributename") === lit(attributeName))
      .select(col("attributevalue"), col("value")).distinct()

  /** LEFT-join one decode onto the fact: `srcCol` (code) → `outCol`
    * (decoded value). */
  def decode(fact: DataFrame, stringmap: DataFrame, attributeName: String,
      srcCol: String, outCol: String): DataFrame = {
    val dim = decodeDim(stringmap, attributeName)
      .withColumnRenamed("attributevalue", s"__k_$outCol")
      .withColumnRenamed("value", outCol)
    fact.join(broadcast(dim), fact(srcCol) === col(s"__k_$outCol"), "left")
      .drop(s"__k_$outCol")
  }

  /** The full star: apply many decodes in sequence — Catalyst folds these
    * into one stage of chained broadcast joins. `specs` are
    * (attributeName, srcCol, outCol). */
  def decodeStar(fact: DataFrame, stringmap: DataFrame,
      specs: Seq[(String, String, String)]): DataFrame =
    specs.foldLeft(fact) { case (df, (attr, src, out)) =>
      decode(df, stringmap, attr, src, out)
    }
}
