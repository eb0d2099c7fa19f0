package graft.tools

import graft.GraftSession
import graft.functions.TextFns
import graft.operators.TextOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

object E3Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.build("e3-probe")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[e3probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val d = spark.read.parquet(s"$dir/documents.parquet")
    d.count()
    val byLangRank = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val sample = d.withColumn("trn", row_number().over(byLangRank))
      .filter(col("trn") <= TextOps.LangTrainPerLang)
      .select(col("lang"), col("text"))
    val byLangCnt = Window.partitionBy(col("lang")).orderBy(col("c").desc, col("g"))
    val profiles = sample
      .select(col("lang"), explode(TextFns.charGrams(col("text"), 1, 3)).as("g"))
      .groupBy(col("lang"), col("g")).agg(count(lit(1)).as("c"))
      .withColumn("prnk", row_number().over(byLangCnt))
      .filter(col("prnk") <= TextOps.LangProfileK)
      .select(col("lang").as("plang"), col("g"), col("prnk"))
    t("profiles") { println("  rows: " + profiles.count()) }
    t("profiles-again") { profiles.count() }
    val docTop = d.select(col("doc_id"),
        posexplode(TextFns.charGramRanks(col("text"), 1, 3, TextOps.LangProfileK)).as(Seq("p0", "g")))
      .select(col("doc_id"), (col("p0") + 1).as("drnk"), col("g"))
    t("docTop") { println("  rows: " + docTop.count()) }
    val byDocDist = Window.partitionBy(col("doc_id")).orderBy(col("dist"), col("plang"))
    val langs = profiles.select(col("plang")).distinct()
    val scored = docTop.crossJoin(broadcast(langs))
      .join(broadcast(profiles), Seq("plang", "g"), "left")
      .groupBy(col("doc_id"), col("plang"))
      .agg(sum(coalesce(abs(col("drnk") - col("prnk")), lit(TextOps.LangProfileK.toLong))).as("dist"))
      .withColumn("gr", row_number().over(byDocDist))
      .filter(col("gr") === 1)
    t("scored") { println("  rows: " + scored.count()) }
    t("full-langId") { TextOps.langId(spark, dir).write.format("noop").mode("overwrite").save() }
    t("full-langId-again") { TextOps.langId(spark, dir).write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
