package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.{JoinFns, TextFns}

/** Property checks for the remaining distributed kernels: the MinHash
  * signature aggregate (c2's core — previously only recall-tested) and
  * the JoinFns skew utilities (result-equivalence to their plain
  * forms on randomized skewed data).
  */
class KernelPropertySpec extends SparkSpec {

  private def run(prop: Prop, name: String, n: Int = 30): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name: $res")
  }

  test("minhash signature == JVM min over (a*h+b) mod m per permutation") {
    val token: Gen[String] = Gen.chooseNum(1, 6).flatMap(n =>
      Gen.stringOfN(n, Gen.alphaLowerChar))
    val doc: Gen[List[String]] = Gen.chooseNum(3, 25).flatMap(n =>
      Gen.listOfN(n, token))
    val perms = TextFns.minhashPerms(16)
    run(Prop.forAll(doc) { toks =>
      import spark.implicits._
      val shingled = toks.sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toSeq
      if (shingled.isEmpty) true
      else {
        // shingle hashes through Spark's xxhash64 (the engine's hash),
        // permutation mins recomputed in plain Scala
        val hs = shingled.toDF("s")
          .select(pmod(xxhash64(col("s")), lit(TextFns.MinhashM)))
          .collect().map(_.getLong(0))
        val want = perms.map { case (a, b) =>
          hs.map(h => java.lang.Math.floorMod(h * a + b, TextFns.MinhashM)).min
        }
        val aggs = TextFns.minhashAggs(col("h"), 16)
        val got = hs.toSeq.toDF("h").agg(aggs.head, aggs.tail: _*)
          .collect()(0).toSeq.map(_.asInstanceOf[Long])
        // and the typed aggregator the engine actually runs must be
        // bit-identical to both
        val gotAgg = hs.toSeq.toDF("h")
          .agg(graft.functions.MinhashAgg.sig(16)(col("h")).as("sig"))
          .collect()(0).getSeq[Long](0)
        got == want && gotAgg == want
      }
    }, "minhash", n = 25)
  }

  test("CDC chunk fingerprints == plain-Scala rolling-hash reimplementation") {
    val token: Gen[String] = Gen.chooseNum(1, 5).flatMap(n =>
      Gen.stringOfN(n, Gen.alphaLowerChar))
    val doc: Gen[List[String]] = Gen.chooseNum(1, 40).flatMap(n =>
      Gen.listOfN(n, token))
    val B = 1000003L; val M = 2147483647L
    def naive(toks: List[String]): Seq[String] = {
      val vals = toks.map(t => t.head.toInt.toLong * 256 + t.length)
      val n = vals.length
      val bnds =
        if (n < 4) Nil
        else (4 to n).filter { i =>
          val h = (i - 4 until i).map(vals)
            .foldLeft(0L)((acc, v) => java.lang.Math.floorMod(acc * B + v, M))
          h % 8 == 0
        }.map(_.toLong)
      val cuts = (0L +: bnds :+ n.toLong).distinct
      cuts.sliding(2).map { case Seq(a, b) =>
        md5hex(toks.slice(a.toInt, b.toInt).mkString(" "))
      }.toSeq
    }
    run(Prop.forAll(doc) { toks =>
      import spark.implicits._
      val got = Seq(toks.mkString(" ")).toDF("text")
        .select(split(col("text"), " ").as("toks"))
        .select(col("toks"),
                graft.operators.DedupOps.cdcVals(col("toks")).as("vals"))
        .select(col("toks"), graft.operators.DedupOps.cdcCuts(4, 8).as("cuts"))
        .select(graft.operators.DedupOps.cdcFps.as("fps"))
        .collect()(0).getSeq[String](0)
      got == naive(toks)
    }, "cdc", n = 25)
  }

  test("saltedJoin == plain inner join on randomized skewed data") {
    val rows: Gen[List[(Long, Long)]] = for {
      n <- Gen.chooseNum(1, 60)
      hot <- Gen.chooseNum(0L, 3L)
      // most rows pile on one hot key — the shape salting exists for
      l <- Gen.listOfN(n, Gen.frequency(
        4 -> Gen.const(hot), 1 -> Gen.chooseNum(0L, 9L)))
    } yield l.zipWithIndex.map { case (k, i) => (k, i.toLong) }
    run(Prop.forAll(rows) { data =>
      import spark.implicits._
      val large = data.toDF("k", "payload")
      val small = (0L to 9L).map(k => (k, s"dim_$k")).toDF("k", "name")
      val plain = large.join(small, "k").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
      val salted = JoinFns.saltedJoin(large, small, "k").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
      plain == salted
    }, "saltedJoin", n = 20)
  }

  test("twoPhaseCount == plain groupBy count") {
    val keys: Gen[List[Long]] = Gen.chooseNum(1, 80).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 5L)))
    run(Prop.forAll(keys) { ks =>
      import spark.implicits._
      val df = ks.zipWithIndex.map { case (k, i) => (k, i.toLong) }
        .toDF("k", "v")
      val plain = df.groupBy("k").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val two = JoinFns.twoPhaseCount(df, "k").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      plain == two
    }, "twoPhaseCount", n = 20)
  }

  test("cappedDistinct == Set model: complete sorted set iff distinct <= cap") {
    // c4's inverted-index aggregator: under-cap groups must yield the
    // COMPLETE distinct set sorted ascending; over-cap groups must
    // yield exactly cap + 1 entries (the caller's drop signal), each a
    // genuine member — through Spark's real partial/merge path (many
    // input partitions force non-trivial buffer merges).
    val cap = 5
    val rows: Gen[List[(Long, Long)]] = Gen.chooseNum(1, 120).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(0L, 9L))))
    run(Prop.forAll(rows) { kv =>
      import spark.implicits._
      val got = kv.toDF("k", "v").repartition(7)
        .groupBy(col("k"))
        .agg(graft.functions.CappedDistinctAgg.fn(cap)(col("v")).as("ids"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
      val model = kv.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      model.forall { case (k, vs) =>
        val ids = got(k)
        if (vs.size <= cap) ids == vs.toVector.sorted
        else ids.length == cap + 1 && ids.toSet.subsetOf(vs) &&
          ids.toSet.size == cap + 1
      }
    }, "cappedDistinct", n = 25)
  }

  test("bloomAgg == Set model: zero false negatives through the partial/merge path; fpp sane") {
    // c12's membership sketch: every inserted fingerprint MUST test
    // positive after Spark's real partial-aggregate + shuffle-merge
    // path (repartition(7) forces non-trivial filter merges); values
    // never inserted may false-positive at ≈fpp but not wholesale.
    val rows: Gen[List[(Long, Long)]] = Gen.chooseNum(1, 200).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 2L), Gen.chooseNum(0L, 50000L))))
    run(Prop.forAll(rows) { kv =>
      import spark.implicits._
      val blooms = kv.toDF("k", "v").repartition(7)
        .groupBy(col("k"))
        .agg(graft.functions.BloomAgg.fn(256L, 0.01)(col("v")).as("bf"))
        .collect()
        .map(r => r.getLong(0) ->
          graft.functions.BloomAgg.deserialize(r.getAs[Array[Byte]](1)))
        .toMap
      val model = kv.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val noFalseNegatives = model.forall { case (k, vs) =>
        vs.forall(blooms(k).mightContainLong)
      }
      // 200 probes of values outside the insert domain: at fpp=0.01
      // and ≤200 inserts into a 256-item filter, >20% hits would mean
      // the sketch is broken (degenerate all-ones), not unlucky
      val fpProbes = (1L to 200L).map(i => 1000000L + i * 7919L)
      val fppSane = blooms.values.forall { bf =>
        fpProbes.count(bf.mightContainLong) <= 40
      }
      noFalseNegatives && fppSane
    }, "bloomAgg", n = 25)
  }
}
