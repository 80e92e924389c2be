package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.DotProductF64

/** Session-extension entry point: wiring for clusters where the engine is
  * deployed via `spark.sql.extensions=graft.GraftExtensions` (no code
  * change in the host app). Currently injects the codegen-native
  * `dot_f64`; new native expressions register here.
  *
  * (Per SURVEY §4, parity needs no custom optimizer rules or strategies —
  * this hook exists for the engine's own native functions only.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_f64"),
      new ExpressionInfo(classOf[DotProductF64].getName, "dot_f64"),
      (exprs: Seq[Expression]) => DotProductF64(exprs(0), exprs(1))))
  }
}
