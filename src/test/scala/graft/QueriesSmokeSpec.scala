package graft

/** Driver-check mirror: every registered query must run at sf0.001 and
  * return rows — catching wiring mistakes and vacuous results (the
  * round-1 b7 lesson: a 0-row result can "pass" an oracle hash match
  * while proving nothing) before the driver does.
  */
class QueriesSmokeSpec extends SparkSpec {

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and is non-vacuous at sf0.001") {
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows — vacuous")
    }
  }

  test("every oracle entry has a matching query (and names align)") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
