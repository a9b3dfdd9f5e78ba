package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r17 optimization contract for Similarity.randomProjection: the
  * compiled SignedProjection path must be BIT-IDENTICAL to the original
  * interpreted `transform(sequence, j -> aggregate(...))` HOF chain —
  * including the null-vector / null-component propagation (all outDims
  * component rows null, rows kept) — on float and double inputs. */
class RandomProjectionEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  /** The ORIGINAL HOF formulation, verbatim (the reference). */
  private def hofProjection(emb: DataFrame, dims: Int, outDims: Int): DataFrame = {
    val signArr: Array[Int] = Array.tabulate(dims * outDims) { r =>
      val d = r / outDims + 1
      val j = r % outDims
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"rp:$d:$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1 else -1
    }
    val signs = typedLit(signArr)
    val projected = transform(sequence(lit(0), lit(outDims - 1)), j =>
      aggregate(sequence(lit(1), lit(dims)),
        lit(0).cast("decimal(18,6)"),
        (acc, d) => (acc +
          round(element_at(col("embedding"), d).cast("double"), 6).cast("decimal(12,6)") *
            element_at(signs, (d - lit(1)) * outDims + j + lit(1))).cast("decimal(18,6)")))
    emb.select(col("vec_id"), posexplode(projected).as(Seq("j", "_s")))
      .select(col("vec_id"), col("j").cast("long").as("j"),
        (col("_s").cast("double") / lit(math.sqrt(outDims.toDouble)))
          .as("component"))
  }

  private def asSet(df: DataFrame): Set[(Long, Long, Option[Long])] =
    df.collect().map { r =>
      val c = if (r.isNullAt(2)) None
        else Some(java.lang.Double.doubleToRawLongBits(r.getDouble(2)))
      (r.getLong(0), r.getLong(1), c) // bit-pattern compare of the double
    }.toSet

  test("float embeddings: compiled == HOF, bit for bit") {
    val rnd = new scala.util.Random(7)
    val emb = (1L to 50L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2f - 1f))).toDF("vec_id", "embedding")
    val fast = operators.Similarity.randomProjection(emb, dims = 16, outDims = 4)
    assert(asSet(fast) === asSet(hofProjection(emb, 16, 4)))
  }

  test("double embeddings with exact-half values: rounding stays in Catalyst") {
    val emb = Seq(
      (1L, Array(0.0000005, -0.0000015, 1.0, -1.0)),
      (2L, Array(0.1234565, 0.9999995, -0.0000005, 0.5))
    ).toDF("vec_id", "embedding")
    val fast = operators.Similarity.randomProjection(emb, dims = 4, outDims = 2)
    assert(asSet(fast) === asSet(hofProjection(emb, 4, 2)))
  }

  test("null vector and null component: all outDims rows kept, components null") {
    val emb = Seq(
      (1L, Array[java.lang.Float](1f, 2f, 3f, 4f)),
      (2L, null.asInstanceOf[Array[java.lang.Float]]),
      (3L, Array[java.lang.Float](1f, null, 3f, 4f))
    ).toDF("vec_id", "embedding")
    val fast = operators.Similarity.randomProjection(emb, dims = 4, outDims = 2)
    val ref = hofProjection(emb, 4, 2)
    assert(asSet(fast) === asSet(ref))
    assert(fast.filter(col("vec_id") === 2L).count() === 2,
      "a null vector still emits outDims component rows")
    assert(fast.filter(col("vec_id") === 3L && col("component").isNull).count() === 2,
      "a null component nulls every projection of that vector")
  }
}
