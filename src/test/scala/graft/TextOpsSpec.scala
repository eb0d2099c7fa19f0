package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.sources.Tables

/** Module E specs — naive Scala recomputations at sf0.001. */
class TextOpsSpec extends SparkSpec {

  private lazy val texts: Map[Long, String] =
    Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("e1 token totals match naive split counts") {
    val got = TextOps.tokenStats(spark, sf)
      .agg(sum("total_tokens")).collect()(0).getLong(0)
    val naive = texts.values.map(_.split(" ", -1).length.toLong).sum
    assert(got == naive)
  }

  test("e2 quality components are in range and ttr/stopword ratios are exact") {
    val got = TextOps.qualityScore(spark, sf).collect()
    assert(got.length == texts.size)
    val stops = Set("the", "a", "of", "to", "and")
    got.foreach { r =>
      val t = texts(r.getAs[Long]("doc_id")).split(" ", -1)
      assert(r.getAs[Long]("n_tokens") == t.length)
      val exp = t.count(stops) .toDouble / t.length
      assert(math.abs(r.getAs[Double]("stopword_ratio") - exp) < 1e-5)
      val ttr = t.distinct.length.toDouble / t.length
      assert(math.abs(r.getAs[Double]("type_token_ratio") - ttr) < 1e-5)
      val q = r.getAs[Double]("quality")
      assert(q >= 0.0 && q <= 1.0)
    }
  }

  test("e3 lang-id guess is deterministic argmax of its scores") {
    val got = TextOps.langId(spark, sf).collect()
    got.foreach { r =>
      val (en, da, qu) = (r.getAs[Double]("en_score"),
                          r.getAs[Double]("data_score"),
                          r.getAs[Double]("query_score"))
      val expect =
        if (en >= da && en >= qu) "en"
        else if (da >= qu) "data-ish" else "query-ish"
      // rounded-score argmax can differ from raw argmax only on exact
      // ties introduced by rounding; tolerate those
      val g = r.getAs[String]("guessed_lang")
      assert(g == expect || Seq(en, da, qu).distinct.size < 3, s"$g vs $expect")
    }
  }

  test("e5 rolling fingerprint matches JVM fold and is order-sensitive") {
    val got = TextOps.rollingFingerprint(spark, sf).collect()
    def roll(tokens: Array[String]): Long =
      tokens.foldLeft(0L)((acc, t) =>
        ((acc * 1000003L + (t.headOption.map(_.toLong).getOrElse(0L) * 256 + t.length))
          % 2147483647L + 2147483647L) % 2147483647L)
    got.foreach { r =>
      val t = texts(r.getAs[Long]("doc_id")).split(" ", -1)
      assert(r.getAs[Long]("rolling_fp") == roll(t))
    }
    // order sensitivity: swapping two distinct tokens changes the hash
    val sample = texts.values.find(t => t.split(" ").distinct.length > 2).get
    val a = sample.split(" ")
    val b = a.clone()
    val i = b.indices.find(i => b(i) != b(0)).get
    val tmp = b(0); b(0) = b(i); b(i) = tmp
    assert(roll(a) != roll(b))
  }

  test("e4 fingerprint matches JVM md5 of the text") {
    val got = TextOps.fingerprint(spark, sf).collect()
    got.foreach { r =>
      val t = texts(r.getAs[Long]("doc_id"))
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r.getAs[String]("fp") == md)
      assert(r.getAs[Long]("n_chars_actual") == t.length)
    }
  }
}
