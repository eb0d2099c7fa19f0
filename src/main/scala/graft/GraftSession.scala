package graft

import org.apache.spark.sql.SparkSession

/** Session builder for the engine (SURVEY.md §3).
  *
  * AQE on (runtime partition coalescing + skew-join splitting), UTC
  * session time zone (oracle parity — the DuckDB compare assumes UTC),
  * shuffle partitions sized to the local core count rather than the
  * 200 default. At cluster scale only the master/partition settings
  * change; no operator below depends on these numbers.
  */
object GraftSession {

  /** Threads/partitions: driver sets SPARK_GRAFT_CPUS; default 4. */
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

  /** Shuffle partitions: default = thread count (right for local test
    * runs). SPARK_GRAFT_SHUFFLE_PARTITIONS overrides it WITHOUT adding
    * threads — the cluster-parity knob for scale experiments: on a real
    * fleet partitions scale with executors, so benching data ×100
    * through a fixed 32-way shuffle makes each task hold 100× the
    * per-task state of the base run (a spill regime no sized cluster
    * would sit in). Scale controls set this to keep per-task volume
    * constant instead.
    */
  def shufflePartitions: String =
    sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)

  /** The off-heap state-store provider for stateful streaming. The
    * default HDFSBackedStateStoreProvider keeps EVERY key's state
    * on-heap per shuffle partition — fine for tests, a hard cliff on a
    * 100 TB event log where per-partition state (per-user folds,
    * stream-join buffers) outgrows executor heap. RocksDB spills state
    * to local disk with an off-heap block cache, bounding heap usage by
    * the cache size instead of the key count. Same results either way
    * (RocksDbStateSpec proves a10/a15 identical under both); switch
    * per-deployment via SPARK_GRAFT_STATE_STORE=rocksdb — state-store
    * choice is an ops decision, not a query-code one.
    */
  val RocksDbProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  def build(appName: String = "graft"): SparkSession = {
    val stateStore = sys.env.get("SPARK_GRAFT_STATE_STORE") match {
      case Some("rocksdb")           => Some(RocksDbProvider)
      case None | Some("hdfs") | Some("") => None
      case Some(other) => throw new IllegalArgumentException(
        s"SPARK_GRAFT_STATE_STORE must be 'rocksdb' or 'hdfs', got '$other'")
    }
    val spark = stateStore.foldLeft(SparkSession.builder()) { (b, cls) =>
      b.config("spark.sql.streaming.stateStore.providerClass", cls)
    }
      .master(s"local[$cpus]")
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
      // parquet reader rejects; read it as a raw nanosecond long — all
      // event-time logic downstream is integer epoch-ms arithmetic.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // ObjectHashAggregate (the exec strategy behind every typed
      // Aggregator here — MinhashAgg, CappedDistinctAgg, TopKAgg)
      // falls back to SORT-based aggregation after this many distinct
      // keys per task; Spark's default of 128 turns any realistic
      // group cardinality into a full sort of the input. Our
      // aggregator states are hard-bounded (≤128 longs for a MinHash
      // signature, ≤df+1 ids for a capped posting list, ≤k heap
      // entries), so a six-figure in-memory key count is a few hundred
      // MB per task, not a hazard — raise the threshold so the hash
      // path survives real key counts. Execution strategy only; plans
      // and results are identical either way. Override per deployment
      // via SPARK_GRAFT_AGG_FALLBACK.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
              sys.env.getOrElse("SPARK_GRAFT_AGG_FALLBACK", "262144"))
      // Planner freedom to pick shuffled-hash over sort-merge when its
      // size conditions hold (guide §3.1/§9: SHJ skips both sorts and
      // often wins when one side is moderately small per partition;
      // sort-merge remains the fallback whenever the conditions fail).
      // Execution strategy only — results identical; override per
      // deployment via SPARK_GRAFT_PREFER_SMJ=true for clusters that
      // would rather never risk a hash-build OOM on skewed builds.
      .config("spark.sql.join.preferSortMergeJoin",
              sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "false"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
