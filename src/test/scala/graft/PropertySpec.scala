package graft

import org.scalacheck.{Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.TopKDoubles
import graft.sources.JobConfig

/** Property-based invariants for the driver-independent pure logic. */
object PropertySpec extends Properties("graft") {

  private val agg = new TopKDoubles(5)

  property("TopKDoubles.reduce keeps k largest, sorted desc") =
    forAll { (xs: List[Double]) =>
      val got = xs.foldLeft(agg.zero)(agg.reduce)
      got == xs.sorted(Ordering[Double].reverse).take(5)
    }

  property("TopKDoubles.merge is order-insensitive and equals global top-k") =
    forAll { (a: List[Double], b: List[Double]) =>
      val pa = a.foldLeft(agg.zero)(agg.reduce)
      val pb = b.foldLeft(agg.zero)(agg.reduce)
      val want = (a ++ b).sorted(Ordering[Double].reverse).take(5)
      agg.merge(pa, pb) == want && agg.merge(pb, pa) == want
    }

  property("JobConfig splits arbitrary env/db/table names") =
    forAll { (db0: String, tbl0: String) =>
      val db = "d" + db0.filter(_.isLetterOrDigit)
      val tbl = "t" + tbl0.filter(_.isLetterOrDigit)
      val c = JobConfig.fromJobName(s"env-$db-$tbl-job", "20240101", "/o")
      c.database == db && c.targetTable == tbl
    }
}
