package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleave built from codegen'd bitwise builtins.
  *
  * Beyond-parity layout tool: the reference writes fact partitions
  * ordered only by ingest (`FULL:1450`); at 100 TB, range-partitioning
  * and sorting by a Morton key over the two (or more) hottest filter
  * columns makes parquet row-group min/max stats tight on BOTH columns
  * at once, so selective scans prune files regardless of which dimension
  * the predicate hits. The key is computed with `shiftleft`/`&`/`|`
  * builtins only — it stays inside whole-stage codegen and adds no UDF
  * or custom expression to the write path.
  *
  * `spread16` is the classic bit-spreading ladder (insert a zero bit
  * between each of the low 16 bits — the "magic numbers" construction,
  * e.g. Hacker's Delight §7-2 / the public Morton-code literature);
  * `interleave16` ORs two spread values, one shifted left by 1.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` so bit i lands at bit 2i. */
  def spread16(c: Column): Column = {
    val m = Seq(0x00FF00FFL, 0x0F0F0F0FL, 0x33333333L, 0x55555555L)
    val shifts = Seq(8, 4, 2, 1)
    var x = c.bitwiseAND(lit(0xFFFFL))
    for ((s, mask) <- shifts.zip(m))
      x = (x.bitwiseOR(shiftleft(x, s))).bitwiseAND(lit(mask))
    x
  }

  /** 32-bit Morton key: even bits from `x`, odd bits from `y` (each
    * truncated to its low 16 bits first — callers bucket/shift wider
    * domains down to 16 significant bits per dimension). */
  def interleave16(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Write-path helper: sort `n` output files by the Morton key of two
    * cluster columns. `repartitionByRange` gives contiguous key ranges
    * per file (tight min/max on both dimensions); the intra-partition
    * sort keeps row groups tight within each file too. */
  def clusterByZ(df: org.apache.spark.sql.DataFrame, x: Column, y: Column,
      n: Int): org.apache.spark.sql.DataFrame = {
    val z = interleave16(x, y)
    df.repartitionByRange(n, z).sortWithinPartitions(z)
  }
}
