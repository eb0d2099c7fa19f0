package graft

import org.apache.spark.sql.functions._
import graft.functions.JoinFns
import graft.sources.Tables

class JoinFnsSpec extends SparkSpec {

  test("salted join returns exactly the plain-join result") {
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("k"), col("o_totalprice"))
    val dim = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("k"), col("o_orderstatus")).limit(100)
    val salted = JoinFns.saltedJoin(o, dim, "k")
      .select("k", "o_totalprice", "o_orderstatus").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sorted.toSeq
    val plain = o.join(dim, "k")
      .select("k", "o_totalprice", "o_orderstatus").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sorted.toSeq
    assert(salted == plain && plain.nonEmpty)
  }

  test("two-phase count equals plain groupBy count") {
    val li = Tables.lineitem(spark, sf).select(col("l_suppkey").as("k"))
    val two = JoinFns.twoPhaseCount(li, "k").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = li.groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two == plain)
  }

  test("salting splits a hot key across reducers") {
    val sp = spark; import sp.implicits._
    // synthetic skew: one key with 50k rows, 100 uniform keys
    val hot = sp.range(50000).select(lit(1L).as("k"), col("id").as("v"))
    val tail = sp.range(5000).select((col("id") % 100 + 2).as("k"), col("id").as("v"))
    val skewed = hot.unionByName(tail)
    val dim = sp.range(102).select(col("id").as("k"), (col("id") * 10).as("w"))

    val joined = JoinFns.saltedJoin(skewed, dim, "k", salts = 8)
    assert(joined.count() == 55000)

    // the hot key's rows must occupy ALL 8 salt buckets, roughly evenly
    val saltDist = skewed
      .withColumn("_salt",
        pmod(xxhash64(struct(skewed.columns.map(col).toIndexedSeq: _*)), lit(8)))
      .filter(col("k") === 1)
      .groupBy("_salt").count().collect().map(r => r.getLong(1))
    assert(saltDist.length == 8)
    assert(saltDist.min > 50000 / 8 / 2,
      s"salt buckets should be roughly even, got ${saltDist.mkString(",")}")
  }

  test("float_vec_dot is callable from SQL via GraftExtensions") {
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb_sql_test")
    val r = spark.sql(
      """SELECT vec_id, round(float_vec_dot(embedding, embedding), 4) AS d
         FROM emb_sql_test ORDER BY vec_id LIMIT 5""").collect()
    assert(r.length == 5)
    // unit-normalized corpus: self-dot ≈ 1
    r.foreach(row => assert(math.abs(row.getDouble(1) - 1.0) < 1e-2))
  }
}
