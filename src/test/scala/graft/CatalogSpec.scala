package graft

import graft.sources.Catalog

/** The SQL surface: base tables and operator results queryable through
  * spark.sql alone, with pushdown surviving the view boundary.
  */
class CatalogSpec extends SparkSpec {

  test("base tables register and join through pure SQL") {
    Catalog.registerTables(spark, sf)
    val got = spark.sql(
      """SELECT r.r_name, count(*) AS n
         FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
         GROUP BY r.r_name ORDER BY r.r_name""").collect()
    assert(got.length == 5)
    assert(got.map(_.getAs[Long]("n")).sum == 25)
  }

  test("filter through a view still pushes to the parquet scan") {
    Catalog.registerTables(spark, sf)
    val plan = spark.sql(
      "SELECT o_orderkey FROM orders WHERE o_orderdate >= TIMESTAMP_NTZ '1997-07-01 00:00:00'")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
      s"pushdown lost through the view:\n$plan")
  }

  test("operator views: SQL over a graft query equals the DataFrame API") {
    Catalog.registerQueries(spark, sf)
    val viaSql = spark.sql(
      "SELECT * FROM graft_b1_pricing_summary").collect()
    val viaApi = SparkEntry.queries("b1_pricing_summary")(spark, sf).collect()
    assert(viaSql.map(_.toString).toSeq == viaApi.map(_.toString).toSeq)
    // composition: aggregate ON TOP of a registered operator view
    val n = spark.sql(
      """SELECT count(*) AS n FROM graft_c1_dedup_exact WHERE is_canonical""")
      .collect()(0).getAs[Long]("n")
    assert(n > 0)
  }

  test("float_vec_dot is callable from SQL (extension registration)") {
    Catalog.registerTables(spark, sf)
    val got = spark.sql(
      """SELECT vec_id, float_vec_dot(embedding, embedding) AS sq
         FROM embeddings ORDER BY vec_id LIMIT 5""").collect()
    assert(got.length == 5)
    assert(got.forall(_.getAs[Double]("sq") > 0.0))
  }

  test("md5_hash64 and max_run are callable from SQL (extension registration)") {
    val r = spark.sql(
      """SELECT md5_hash64('abc') AS h,
                max_run(array('b', 'a', 'b')) AS m""").collect()(0)
    // first 16 hex chars of md5('abc') = 900150983cd24fb0, as a signed long
    assert(r.getAs[Long]("h") == java.lang.Long.parseUnsignedLong(
      "900150983cd24fb0", 16))
    val m = r.getStruct(r.fieldIndex("m"))
    assert(m.getAs[Long]("best") == 2L && m.getAs[String]("gram") == "b")
  }
}
