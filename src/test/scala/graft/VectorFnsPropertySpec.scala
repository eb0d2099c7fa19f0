package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.VectorFns

/** Property-based checks of the vector kernels on randomized
  * equal-length float vectors (FloatVecDot documents min-length
  * truncation for mismatched inputs; the fold form null-pads, so
  * only the equal-length contract is shared).
  */
class VectorFnsPropertySpec extends SparkSpec {

  private val vecPair: Gen[(Array[Float], Array[Float])] = for {
    n <- Gen.chooseNum(0, 48)
    f = Gen.chooseNum(-8.0f, 8.0f)
    a <- Gen.listOfN(n, f)
    b <- Gen.listOfN(n, f)
  } yield (a.toArray, b.toArray)

  private def run(prop: Prop, name: String): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, s"$name: $res")
  }

  private def jvmDot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  private def evalPair(a: Array[Float], b: Array[Float])(
      c: org.apache.spark.sql.Column): org.apache.spark.sql.Row = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b").select(c).collect()(0)
  }

  test("FloatVecDot == zip_with fold == JVM left-to-right double fold") {
    run(Prop.forAll(vecPair) { case (a, b) =>
      val r = evalPair(a, b)(struct(
        VectorFns.dot(col("a"), col("b")),
        VectorFns.dotFold(col("a"), col("b")))).getStruct(0)
      val want = jvmDot(a, b)
      // bit equality, not epsilon: all three are the same fold order
      r.getDouble(0) == want && r.getDouble(1) == want
    }, "dot")
  }

  test("norm is the sqrt of the self-dot, non-negative") {
    run(Prop.forAll(vecPair) { case (a, _) =>
      val got = evalPair(a, a)(VectorFns.norm(col("a"))).getDouble(0)
      got == math.sqrt(jvmDot(a, a)) && got >= 0.0
    }, "norm")
  }

  test("lshBand extracts exactly the banded bits") {
    val gen = for {
      sig <- Gen.long; b <- Gen.chooseNum(0, 7); bits <- Gen.chooseNum(1, 8)
    } yield (sig, b, bits)
    run(Prop.forAll(gen) { case (sig, b, bits) =>
      import spark.implicits._
      val got = Seq(sig).toDF("sig")
        .select(VectorFns.lshBand(col("sig"), b, bits)).collect()(0).getLong(0)
      got == ((sig >>> (b * bits)) & ((1L << bits) - 1))
    }, "lshBand")
  }

  test("lshSig uses only the low nPlanes bits and is deterministic") {
    run(Prop.forAll(vecPair.suchThat(_._1.nonEmpty)) { case (a, _) =>
      import spark.implicits._
      val df = Seq(a).toDF("v")
      val s1 = df.select(VectorFns.lshSig(col("v"), 12, a.length)).collect()(0).getLong(0)
      val s2 = df.select(VectorFns.lshSig(col("v"), 12, a.length)).collect()(0).getLong(0)
      s1 == s2 && (s1 >>> 12) == 0L
    }, "lshSig")
  }
}
