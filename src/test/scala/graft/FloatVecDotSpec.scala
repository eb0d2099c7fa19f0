package graft

import org.apache.spark.sql.functions._
import graft.functions.{FloatVecDot, VectorFns}
import graft.sources.Tables

/** The custom codegen expression must be bit-identical to the
  * composable zip_with/aggregate fold on real data, in both the
  * codegen and interpreted paths.
  */
class FloatVecDotSpec extends SparkSpec {

  test("FloatVecDot is bit-identical to the zip_with/aggregate fold") {
    val emb = Tables.embeddings(spark, sf).limit(200)
    val both = emb.crossJoin(
        emb.select(col("vec_id").as("id2"), col("embedding").as("e2")).limit(20))
      .select(
        FloatVecDot(col("embedding"), col("e2")).as("native"),
        VectorFns.dotFold(col("embedding"), col("e2")).as("fold"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
             java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("interpreted eval matches codegen result") {
    val e = Tables.embeddings(spark, sf).limit(5)
      .select(col("embedding")).collect().map(_.getSeq[Float](0).toArray)
    // JVM-side expected value
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val viaSpark = Tables.embeddings(spark, sf).limit(5)
      .select(FloatVecDot(col("embedding"), col("embedding")).as("d"))
      .collect().map(_.getDouble(0))
    val expected = e.map(v => dot(v, v))
    viaSpark.zip(expected).foreach { case (g, x) => assert(g == x) }
  }

  test("null input yields null, not a crash") {
    val viaSpark = Tables.embeddings(spark, sf).limit(3)
      .select(FloatVecDot(lit(null).cast("array<float>"), col("embedding")).as("d"))
      .collect()
    assert(viaSpark.forall(_.isNullAt(0)))
  }
}
