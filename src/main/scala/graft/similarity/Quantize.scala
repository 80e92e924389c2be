package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding compression for 100 TB-scale similarity: symmetric int8
  * quantization (8× memory over float64, 4× over the source float32)
  * and 1-bit sign signatures (64× — the layout that lets a Hamming
  * pre-filter replace full-precision scans for candidate generation).
  *
  * Everything is expression-only (higher-order array functions +
  * integer bit ops inside whole-stage codegen): no UDF, no shuffle
  * except the candidate-pair join, which reuses the banded
  * inverted-index shape of `Dedup.simhashPairs` — never all-pairs.
  */
object Quantize {

  /** Per-vector symmetric int8 quantization profile:
    * `q_i = round(x_i / scale · 127)` with `scale = max|x_i|` (the
    * standard absmax scheme). Emits audit scalars instead of the raw
    * int8 array (oracle outputs must be sortable scalars): the vector
    * dim, the 6dp-rounded scale, an order-sensitive checksum
    * `Σ q_i·(i+1)`, and the max absolute reconstruction error — the
    * quantization-loss metric a pipeline monitors. Zero vectors
    * quantize to all-zero with scale 0 (guarded division). */
  def int8Profile(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("scale", array_max(expr("transform(e, x -> abs(x))")))
      .withColumn("q", expr(
        "transform(e, x -> CAST(round(CASE WHEN scale = 0 THEN 0.0 " +
          "ELSE x / scale * 127 END) AS INT))"))
      .select(col("vec_id"),
        size(col("e")).cast("long").as("dim"),
        round(col("scale"), 6).as("scale_r"),
        expr("aggregate(zip_with(q, sequence(1, size(q)), " +
          "(v, i) -> CAST(v AS BIGINT) * i), CAST(0 AS BIGINT), " +
          "(a, x) -> a + x)").as("q_checksum"),
        round(expr("array_max(transform(e, x -> abs(x - " +
          "round(CASE WHEN scale = 0 THEN 0.0 ELSE x / scale * 127 END) " +
          "* scale / 127)))"), 6).as("max_abs_err"))

  /** 63-bit sign signature: bit i set iff component i+1 > 0. 63 bits,
    * not 64, so the signature stays a positive BIGINT in both engines
    * (bit 63 would be the two's-complement sign bit and the SQL twin
    * would need negative-literal gymnastics). */
  def signSignature(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .select(col("vec_id"),
        (0 until 63).map(i =>
          when(element_at(col("e"), i + 1) > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ + _).as("sig"))

  /** Hamming candidate pairs over sign signatures: 7 bands of 9 bits —
    * by pigeonhole, any pair within Hamming distance ≤ 6 shares at
    * least one intact band, so recall is EXACT for maxHamming ≤ 6
    * (unlike probabilistic MinHash banding). Above 6 the same
    * candidate+verify shape still works, with the standard LSH recall
    * contract instead: a pair surfaces iff some 9-bit band survives
    * its bit flips, which is likely for near pairs and vanishing for
    * far ones. Inverted-index equi-join on (band, value); per-bucket
    * work is quadratic only within 9-bit-equal buckets, which shrink
    * as the corpus spreads over 2^9 values per band — never
    * all-pairs, at any radius. */
  def hammingPairs(sigs: DataFrame, maxHamming: Int = 6): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 63, "radius must fit the 63-bit signature")
    val banded = graft.CacheScope.persist(sigs)
      .select(col("vec_id"), col("sig"),
        explode(array((0 until 7).map(k =>
          struct(lit(k).as("band_idx"),
            (shiftright(col("sig"), k * 9) % 512).as("band_val"))): _*)).as("b"))
      .select(col("vec_id"), col("sig"), col("b.band_idx"), col("b.band_val"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b,
      col("a.band_idx") === col("b.band_idx") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig")))
          .cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
