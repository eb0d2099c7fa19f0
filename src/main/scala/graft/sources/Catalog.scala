package graft.sources

import org.apache.spark.sql.SparkSession

/** SQL surface: register the warehouse tables (and optionally every
  * named operator result) as temp views, so a SQL-only user drives the
  * engine entirely through `spark.sql` — the Spark analog of the
  * reference's REST query layer. Views are lazy plans, not snapshots:
  * `registerQueries` costs nothing until a view is selected, and each
  * query against a view re-plans against current data.
  */
object Catalog {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Register the ten base tables as temp views named as in TESTDATA. */
  def registerTables(spark: SparkSession, dir: String): Unit =
    tableNames.foreach { n =>
      Tables.table(spark, dir, n).createOrReplaceTempView(n)
    }

  /** Register every SparkEntry query as a `graft_<name>` temp view —
    * `SELECT * FROM graft_b3_marketplace_listing` etc. Batch queries
    * stay lazy plans; the streaming-backed ones (a9/a10/a13–a15 and
    * p5_stream_ingest) run their catch-up micro-batches AT
    * REGISTRATION (their result is a materialized memory-sink table —
    * p5's holds the whole enriched corpus in driver memory), so call
    * this when that cost is acceptable, or register tables only.
    */
  def registerQueries(spark: SparkSession, dir: String): Unit =
    graft.SparkEntry.queries.foreach { case (name, q) =>
      q(spark, dir).createOrReplaceTempView(s"graft_$name")
    }
}
