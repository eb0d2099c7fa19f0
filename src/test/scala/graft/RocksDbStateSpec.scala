package graft

import graft.streaming.EventStream

/** State-store provider seam (SURVEY §4): stateful streams must give
  * IDENTICAL answers under the default on-heap HDFSBacked provider and
  * the RocksDB provider (the 100 TB setting — state spills to local
  * disk instead of holding every key on-heap per partition). Providers
  * are swapped via the session SQL conf, which each stream captures at
  * start — the same seam GraftSession's SPARK_GRAFT_STATE_STORE env
  * reaches.
  */
class RocksDbStateSpec extends SparkSpec {
  private val key = "spark.sql.streaming.stateStore.providerClass"

  private def withProvider[A](cls: String)(body: => A): A = {
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, cls)
    try body
    finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("provider conf is honored at stream start (bogus class fails loudly)") {
    // proves the seam engages: if the provider setting were ignored,
    // the rocksdb runs below would silently test the default store
    val err = intercept[Exception] {
      withProvider("graft.NoSuchStateStoreProvider") {
        EventStream.streamState(spark, sf).collect()
      }
    }
    def classNames(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        e.getClass.getName +: Option(e.getMessage).toSeq ++:
          classNames(e.getCause))
    assert(classNames(err).mkString("\n").contains("NoSuchStateStoreProvider"),
      s"expected the bogus provider class in the failure, got: $err")
  }

  test("a10 state fold under RocksDB matches the default provider") {
    val base = EventStream.streamState(spark, sf).collect().map(_.toString)
    val rocks = withProvider(GraftSession.RocksDbProvider) {
      EventStream.streamState(spark, sf).collect().map(_.toString)
    }
    assert(base.nonEmpty && rocks.sameElements(base))
  }

  test("a15 buffered as-of under RocksDB matches the default provider") {
    val base = EventStream.streamAsofOoo(spark, sf).collect().map(_.toString)
    val rocks = withProvider(GraftSession.RocksDbProvider) {
      EventStream.streamAsofOoo(spark, sf).collect().map(_.toString)
    }
    assert(base.nonEmpty && rocks.sameElements(base))
  }
}
