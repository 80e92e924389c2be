package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, hex, to_json}
import org.apache.spark.sql.types.{ArrayType, BinaryType, MapType, StructType}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** No-oracle (rows-only) queries may return nested struct/array columns;
    * the driver's pandas `sort_values` over such columns raises
    * "unhashable type: dict" and the query logs an error instead of a
    * rows-only pass. Canonicalize: JSON-encode complex columns and
    * hex-encode binary so every dumped column is a sortable scalar.
    * Oracle-checked queries are dumped as-is (their shape is part of the
    * hash contract). */
  private[graft] def canonicalizable(df: DataFrame): DataFrame = {
    // df(f.name), not col(f.name): a top-level name containing a dot
    // would misresolve as a nested path under the unqualified resolver
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: StructType | _: ArrayType | _: MapType =>
          to_json(df(f.name)).as(f.name)
        case _: BinaryType => hex(df(f.name)).as(f.name)
        case _ => df(f.name)
      }
    }
    df.select(cols.toSeq: _*)
  }
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      try CacheScope.scoped {
        val df = fn(spark, sfDir)
        val out = if (SparkEntry.oracleSql.contains(name)) df
                  else canonicalizable(df)
        out.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
