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
