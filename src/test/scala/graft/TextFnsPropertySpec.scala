package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.TextFns

/** Property-based checks of the text-function kernels: the Spark
  * column expressions evaluated on randomized inputs must agree with
  * straightforward JVM reference models. Catches boundary classes
  * example tests miss (empty docs, 1-token docs, doc shorter than the
  * shingle, repeated tokens, unicode-ish content).
  */
class TextFnsPropertySpec extends SparkSpec {

  private val token: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n =>
      Gen.stringOfN(n, Gen.oneOf(('a' to 'z') ++ ('0' to '9'))))
  private val doc: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, token).map(_.mkString(" ")))

  private def run(prop: Prop, name: String): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, s"$name: $res")
  }

  private def evalOnce(text: String)(
      cols: org.apache.spark.sql.Column*): org.apache.spark.sql.Row = {
    import spark.implicits._
    Seq(text).toDF("text").select(cols: _*).collect()(0)
  }

  // mixed-width unicode text: the CharGrams byte-offset table must
  // slice character-correct windows through 1-4 byte codepoints
  private val uniText: Gen[String] =
    Gen.chooseNum(0, 30).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(
        Gen.oneOf(('a' to 'z') ++ Seq(' ', '.', '!')).map(_.toString),
        Gen.oneOf("é", "ß", "日", "本", "語", "€", "𝕏"))).map(_.mkString))

  test("charGrams == JVM substring sliding model on mixed-width unicode") {
    run(Prop.forAll(uniText) { t =>
      val got = evalOnce(t)(TextFns.charGrams(col("text"), 1, 3))
        .getSeq[String](0)
      // reference: by CODE POINT (SQL substr semantics — a surrogate
      // pair is one character)
      val cps = t.codePoints.toArray.map(cp => new String(Character.toChars(cp)))
      val want = (1 to 3).flatMap(n =>
        if (cps.length >= n) cps.sliding(n).map(_.mkString).toSeq else Nil)
      got == want
    }, "charGrams")
  }

  test("charGramRanks == JVM count/sort/topK model on mixed-width unicode") {
    run(Prop.forAll(uniText, Gen.chooseNum(1, 10)) { (t, k) =>
      val got = evalOnce(t)(TextFns.charGramRanks(col("text"), 1, 3, k))
        .getSeq[String](0)
      val cps = t.codePoints.toArray.map(cp => new String(Character.toChars(cp)))
      val grams = (1 to 3).flatMap(n =>
        if (cps.length >= n) cps.sliding(n).map(_.mkString).toSeq else Nil)
      // reference tie order: UTF-8 byte-wise unsigned (Spark string
      // order); compare via the UTF-8 byte arrays
      def byteLt(a: String, b: String): Boolean = {
        val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
        val n = math.min(x.length, y.length)
        var i = 0
        while (i < n) {
          if ((x(i) & 0xFF) != (y(i) & 0xFF)) return (x(i) & 0xFF) < (y(i) & 0xFF)
          i += 1
        }
        x.length < y.length
      }
      val want = grams.groupBy(identity).view.mapValues(_.size).toSeq
        .sortWith { case ((g1, c1), (g2, c2)) =>
          if (c1 != c2) c1 > c2 else byteLt(g1, g2)
        }
        .take(k).map(_._1)
      got == want
    }, "charGramRanks")
  }

  test("shingles == JVM sliding-window model (incl. short/empty docs)") {
    run(Prop.forAll(doc) { t =>
      val got = evalOnce(t)(TextFns.shingles(TextFns.tokens(col("text")), 3))
        .getSeq[String](0)
      val toks = t.split(" ", -1).toSeq
      val want =
        if (toks.size < 3) Seq.empty
        else toks.sliding(3).map(_.mkString(" ")).toSeq
      got == want
    }, "shingles")
  }

  test("MaxRun == JVM mode with (count desc, gram asc) tie-break") {
    // e10's kernel: arrays drawn from a SMALL token alphabet so
    // repeated elements and count-ties are common, plus the empty
    // array (fold-initial) case.
    val smallTok: Gen[String] =
      Gen.oneOf("a", "b", "aa", "ab", "b0", "zz9")
    val arr: Gen[List[String]] =
      Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, smallTok))
    run(Prop.forAll(arr) { xs =>
      import spark.implicits._
      val got = Seq(Tuple1(xs)).toDF("xs")
        .select(graft.functions.MaxRun(col("xs")).as("m"))
        .select(col("m.best"), col("m.gram")).collect()(0)
      val want =
        if (xs.isEmpty) (0L, "")
        else {
          val counts = xs.groupBy(identity).view.mapValues(_.size.toLong)
          val bestCount = counts.values.max
          (bestCount,
           counts.filter(_._2 == bestCount).keys.min)
        }
      (got.getLong(0), got.getString(1)) == want
    }, "maxRun")
  }

  test("rolling fingerprint == JVM Rabin-Karp fold") {
    run(Prop.forAll(doc) { t =>
      val vals = t.split(" ", -1).map { tok =>
        val a = if (tok.isEmpty) 0L else tok.charAt(0).toLong
        a * 256L + tok.length
      }
      val want = vals.foldLeft(0L)((acc, v) =>
        java.lang.Math.floorMod(acc * 1000003L + v, 2147483647L))
      val toks = TextFns.tokens(col("text"))
      val rolled = aggregate(
        transform(toks, x => (ascii(x) * 256 + length(x)).cast("long")),
        lit(0L), (acc, v) => pmod(acc * 1000003L + v, lit(2147483647L)))
      evalOnce(t)(rolled).getLong(0) == want
    }, "rollingFp")
  }

  test("simhash64 == JVM bit-vote model") {
    run(Prop.forAll(doc.suchThat(_.nonEmpty)) { t =>
      val got = evalOnce(t)(TextFns.simhash64(TextFns.tokens(col("text"))))
        .getLong(0)
      // fully independent JVM model: md5-derived word hash (first 16
      // hex chars as two 32-bit halves — TextFns.md5hash64's contract)
      // + plain-Scala bit votes
      def md5h64(s: String): Long = {
        val hex = md5hex(s)
        (java.lang.Long.parseLong(hex.substring(0, 8), 16) << 32) |
          java.lang.Long.parseLong(hex.substring(8, 16), 16)
      }
      val hs = t.split(" ", -1).toSeq.map(md5h64)
      var want = 0L
      (0 until 64).foreach { b =>
        val vote = hs.map(h => if (((h >>> b) & 1L) == 1L) 1 else -1).sum
        if (vote > 0) want |= (1L << b)
      }
      got == want
    }, "simhash64")
  }

  test("simhash_64 kernel == composable simhash64 (randomized + empty-token edges)") {
    run(Prop.forAll(doc) { t =>
      val r = evalOnce(t)(
        TextFns.simhash64Kernel(col("text")),
        TextFns.simhash64(TextFns.tokens(col("text"))))
      r.getLong(0) == r.getLong(1)
    }, "simhash64Kernel")
    // pinned split(-1) edges: empty text, trailing/leading/double
    // spaces all keep their empty tokens in BOTH forms
    Seq("", " ", "a ", " a", "a  b", "  ").foreach { t =>
      val r = evalOnce(t)(
        TextFns.simhash64Kernel(col("text")),
        TextFns.simhash64(TextFns.tokens(col("text"))))
      assert(r.getLong(0) == r.getLong(1), s"edge '$t'")
    }
  }

  test("hamming64 == Long.bitCount of xor") {
    run(Prop.forAll(Gen.long, Gen.long) { (a, b) =>
      evalOnce("")(TextFns.hamming64(lit(a), lit(b))).getInt(0) ==
        java.lang.Long.bitCount(a ^ b)
    }, "hamming64")
  }
}
