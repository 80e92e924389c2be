package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator: keeps the k largest doubles per group in a
  * bounded buffer (the custom-Aggregator path of SURVEY §7 step 9).
  *
  * Versus the window top-k (sort + WindowGroupLimit), this is a
  * map-side-combining aggregate: each partition reduces to ≤k values per
  * group before the shuffle, so the shuffle volume is O(groups·k)
  * regardless of fan-in — the right shape when groups are huge or skewed.
  * The buffer stays sorted descending; merge is a bounded merge.
  */
class TopKDoubles(k: Int) extends Aggregator[Double, Seq[Double], Seq[Double]] {

  override def zero: Seq[Double] = Vector.empty

  private def insert(buf: Seq[Double], v: Double): Seq[Double] = {
    if (buf.length >= k && v <= buf.last) buf
    else {
      val (hi, lo) = buf.span(_ >= v)
      ((hi :+ v) ++ lo).take(k)
    }
  }

  override def reduce(buf: Seq[Double], v: Double): Seq[Double] = insert(buf, v)

  override def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] =
    b.foldLeft(a)(insert)

  override def finish(r: Seq[Double]): Seq[Double] = r

  override def bufferEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
