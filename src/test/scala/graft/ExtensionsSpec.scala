package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

/** The extension hook's end-to-end effect (dot_f64 resolving in SQL) is
  * covered by VectorExpressionSpec via the registry path; here we pin the
  * `spark.sql.extensions`-style wiring itself (a fresh `withExtensions`
  * session can't be built inside the shared-JVM test session). */
class ExtensionsSpec extends AnyFunSuite {
  test("GraftExtensions wiring applies cleanly to a fresh extension set") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }
}
