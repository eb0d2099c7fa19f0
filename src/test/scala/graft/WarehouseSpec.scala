package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.{Tables, Warehouse}

/** The bucketed layout must (a) produce identical results to the raw
  * join and (b) plan the fact⋈fact join with ZERO shuffle exchanges —
  * the property that makes it the 100 TB strategy.
  */
class WarehouseSpec extends SparkSpec {

  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // finalize AQE
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case other => other +: other.children.flatMap(walk)
      }
    walk(df.queryExecution.executedPlan).count(_.isInstanceOf[ShuffleExchangeLike])
  }

  test("bucketed orders-lineitem join is shuffle-free and result-identical") {
    Warehouse.build(spark, sf)
    val bucketed = Warehouse.revenueJoinBucketed(spark)
    // raw equivalent over plain parquet
    val raw = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
             .as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy(col("o_orderstatus"))
    assert(bucketed.collect().toSeq == raw.collect().toSeq)

    // join itself must be exchange-free: only the final tiny
    // groupBy(status) aggregate (post-join, 3 groups) may shuffle
    val joinOnly = Warehouse.lineitemB(spark)
      .join(Warehouse.ordersB(spark), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"))
    assert(shuffleCount(joinOnly) == 0,
      "bucketed fact join should not shuffle either side")
  }
}
