package graft

/** Shared statistics for the measurement mains: one median definition
  * so no bench can drift from the label it prints. For even-length rep
  * vectors this is the TRUE median (mean of the two middle elements) —
  * the previous per-main `s(n/2)` was the upper middle, which biased
  * every even-rep "median" high. Odd-length behavior is unchanged, so
  * the committed 3- and 5-rep artifacts compare like for like.
  */
object BenchStats {
  def median(xs: Seq[Double]): Double = {
    require(xs.nonEmpty, "median of an empty rep vector")
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }
}
