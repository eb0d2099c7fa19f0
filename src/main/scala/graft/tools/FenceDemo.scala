package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import graft.operators.RetrievalOps
import graft.sources.Warehouse

/** Two-JVM manifest-fence demo (round 16, verdict item 6): the
  * optimistic-concurrency claim of the warehouse commit protocol —
  * "a maintenance swap that raced ANY writer fails its commit with
  * both sides intact" — proven across real PROCESS boundaries, not
  * just interleaved calls inside one JVM. CrashMatrixSpec pins the
  * in-process matrix; this tool is the cross-process arm: the atomic
  * claim is a filesystem hard link, so nothing about it is
  * JVM-scoped, but only a second JVM demonstrates that.
  *
  * Choreography (file-based sync between the processes):
  *   1. parent: build a scratch corpus + landed posting index, upsert
  *      batch A, fork the CHILD JVM;
  *   2. child: fresh SparkSession over the SAME spark-warehouse
  *      (cross-process adoption), runs compactPostings with a seam
  *      that pauses at "pre-commit" — snapshot taken, generation
  *      staged, partition guard passed, one step before the manifest
  *      link;
  *   3. parent: upserts batch B (bumps the manifest) while the child
  *      is paused, then releases it;
  *   4. child: its commit at snapshot-version+1 loses the link race →
  *      aborts, drops its staged generation, exits 0 with the
  *      "aborted" marker;
  *   5. parent: asserts the child aborted (never committed), probes
  *      BOTH batches through the standing generation, and re-runs the
  *      compaction at a quiet point to show the store is not wedged.
  *
  * Prints one JSON evidence line. Run:
  * `sbt "runMain graft.tools.FenceDemo [sfDir]"`. Dev tool only.
  */
object FenceDemo {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val dir = Files.createTempDirectory("graft_fence_").toString
    Files.copy(Paths.get(sf, "documents.parquet"),
               Paths.get(dir, "documents.parquet"),
               StandardCopyOption.REPLACE_EXISTING)
    val sync = Files.createTempDirectory("graft_fence_sync_").toString
    val spark = graft.GraftSession.build("graft-fence-parent")
    import spark.implicits._

    Warehouse.ensurePostings(spark, dir, excludeMod = 2)
    Warehouse.upsertPostingsFrom(
      Seq((999991001L, "zzfencea zzfencea filler1"))
        .toDF("doc_id", "text"), dir, batchKey = 1L)

    // fork the child against the same cwd (same spark-warehouse),
    // inheriting this JVM's full classpath (sbt's forked run JVM
    // carries the compiled classes + every Spark jar)
    val cp = System.getProperty("java.class.path")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq("java") ++ addOpens ++ Seq(
      "-Xmx4g", "-cp", cp,
      "graft.tools.FenceChild", dir, sync)
    System.err.println(s"[fence] child cmd: ${cmd.mkString(" ")}")
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(new java.io.File(System.getProperty("user.dir")))
    pb.environment().put("SPARK_GRAFT_CPUS", "4")
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val childOut = new Thread(() => {
      val br = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream))
      Iterator.continually(br.readLine()).takeWhile(_ != null)
        .foreach(l => System.err.println(s"[child] $l"))
    })
    childOut.setDaemon(true)
    childOut.start()

    def marker(n: String) = Paths.get(sync, n)
    def await(n: String, ms: Long = 180000L): Unit = {
      val t0 = System.currentTimeMillis()
      while (!Files.exists(marker(n))) {
        if (!proc.isAlive && !Files.exists(marker(n)))
          sys.error(s"child died before $n")
        if (System.currentTimeMillis() - t0 > ms)
          sys.error(s"timeout waiting for $n")
        Thread.sleep(100)
      }
    }

    // child pauses one step before its manifest link…
    await("child-staged")
    // …while THIS process lands a batch (bumps the manifest)…
    Warehouse.upsertPostingsFrom(
      Seq((999991002L, "zzfenceb zzfenceb filler2"))
        .toDF("doc_id", "text"), dir, batchKey = 2L)
    Files.write(marker("parent-wrote"), Array.emptyByteArray)
    // …and the child's commit must lose the race
    val exit = proc.waitFor()
    val aborted = Files.exists(marker("child-aborted"))
    val committed = Files.exists(marker("child-committed"))

    def hits(token: String, id: Long): Boolean =
      RetrievalOps.bm25RankIndexed(spark, dir,
          Seq((0L, token)).toDF("query_id", "term"), k = 5,
          exclSelf = false, maxTerms = 1)
        .collect().exists(_.getAs[Long]("doc_id") == id)
    val bothIntact = hits("zzfencea", 999991001L) &&
      hits("zzfenceb", 999991002L)
    // quiet point: the compaction lands and still serves both batches
    Warehouse.compactPostings(spark, dir)
    val bothAfterCompact = hits("zzfencea", 999991001L) &&
      hits("zzfenceb", 999991002L)

    println(s"""{"metric":"fence_demo","child_exit":$exit,""" +
      s""""child_aborted":$aborted,"child_committed":$committed,""" +
      s""""both_batches_intact":$bothIntact,""" +
      s""""both_after_quiet_compaction":$bothAfterCompact,""" +
      s""""pass":${aborted && !committed && bothIntact && bothAfterCompact}}""")
    spark.stop()
    if (!(aborted && !committed && bothIntact && bothAfterCompact))
      sys.exit(1)
  }
}

/** The forked half of [[FenceDemo]] — a SEPARATE JVM that adopts the
  * parent's landed warehouse and attempts the racing compaction,
  * pausing at the pre-commit seam until the parent's writer has
  * landed. Exits 0 on the expected fence abort.
  */
object FenceChild {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val sync = args(1)
    def touch(n: String): Unit = {
      java.nio.file.Files.write(Paths.get(sync, n), Array.emptyByteArray)
      ()
    }
    def await(n: String, ms: Long = 180000L): Unit = {
      val t0 = System.currentTimeMillis()
      while (!Files.exists(Paths.get(sync, n))) {
        if (System.currentTimeMillis() - t0 > ms)
          sys.error(s"timeout waiting for $n")
        Thread.sleep(100)
      }
    }
    val spark = graft.GraftSession.build("graft-fence-child")
    try {
      Warehouse.compactPostingsHooked(spark, dir, () => (), step =>
        if (step == "pre-commit") {
          touch("child-staged")
          await("parent-wrote")
        })
      touch("child-committed")
      println("[fence-child] COMMITTED — the racing writer was not fenced")
    } catch {
      case e: IllegalStateException if e.getMessage.contains("concurrent") =>
        touch("child-aborted")
        println(s"[fence-child] aborted as required: ${e.getMessage}")
    } finally spark.stop()
  }
}
