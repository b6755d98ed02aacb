package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.TextDedup
import graft.streaming.DedupStream

/** Micro-probe: where does one `ext_ingest_loop` evaluation spend its
  * ~20 s? Times index build, then each tick's layers separately (intra
  * exact, vs-corpus survivors, intra pairs+clusters, append+write) on
  * the same id-pinned batches the catalog entry uses.
  */
object IngestTickProbe {

  def main(args: Array[String]): Unit = {
    val spark = BenchUtil.scaleSession()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") < 300)
    val b0 = docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
      .unionByName(docs.filter(col("doc_id") < 6)
        .select((col("doc_id") + 20000).as("doc_id"), col("text")))
      .unionByName(docs.filter(col("doc_id") >= 300 && col("doc_id") < 303)
        .select((col("doc_id") + 21000).as("doc_id"), col("text")))
    val idx = graft.core.TmpDirs.scoped("tickprobe_idx")
    val out = graft.core.TmpDirs.scoped("tickprobe_out")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    t("writeIncrementalIndex")(TextDedup.writeIncrementalIndex(corpus, idx, k = 2))

    // tick layers, separately timed
    import org.apache.spark.sql.expressions.Window
    val wExact = Window.partitionBy(col("__h")).orderBy(col("doc_id").asc)
    val intraExact = t("intra-exact count") {
      val d = b0.withColumn("__h", md5(col("text")))
        .withColumn("__rn", row_number().over(wExact))
        .filter(col("__rn") === 1).drop("__h", "__rn")
      d.count(); d
    }
    val vsCorpus = t("vs-corpus survivors") {
      val d = TextDedup.incrementalSurvivorsIndexed(
        spark, intraExact, idx, 0.8, Long.MaxValue, 2, "doc_id", "text",
        excludeBatchTag = Some("b0"))
      d.count(); d
    }
    val losers = t("intra pairs+clusters") {
      val pairs = TextDedup.jaccardPairs(vsCorpus, 2, 0.8, Long.MaxValue, "doc_id")
      val l = TextDedup.clusters(pairs)
        .filter(col("cluster_id") =!= col("id"))
        .select(col("id").as("doc_id"))
      l.count(); l
    }
    val keepers = t("keepers localCheckpoint") {
      vsCorpus.join(losers, Seq("doc_id"), "left_anti").localCheckpoint()
    }
    t("appendIncrementalIndex")(
      TextDedup.appendIncrementalIndex(keepers, idx, "b0", k = 2))
    t("output write+count") {
      keepers.write.mode("overwrite").parquet(s"$out/batch=b0")
      keepers.count()
    }

    t("full tick b1 (end-to-end)") {
      val b1 = docs.filter(col("doc_id") >= 400 && col("doc_id") < 500)
        .unionByName(docs.filter(col("doc_id") >= 300 && col("doc_id") < 310)
          .select((col("doc_id") + 30000).as("doc_id"), col("text")))
      DedupStream.ingestTick(spark, b1, idx, out, "b1",
        k = 2, tau = 0.8, maxShingleDf = Long.MaxValue)
    }

    // slice-count creep: a long-lived loop accumulates one slice per tick;
    // measure the pure serving read (incrementalSurvivorsIndexed) against
    // a many-slice index vs its compacted copy
    if (args.length > 1) {
      val nSlices = args(1).toInt
      val probe = docs.filter(col("doc_id") >= 400 && col("doc_id") < 500)
      (0 until nSlices).foreach { i =>
        val sl = docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
          .select((col("doc_id") + lit(40000L + i * 1000L)).as("doc_id"),
            col("text"))
        TextDedup.appendIncrementalIndex(sl, idx, s"s$i", k = 2)
      }
      def serve(dir: String): Long = TextDedup.incrementalSurvivorsIndexed(
        spark, probe, dir, 0.8, Long.MaxValue, 2).count()
      def med(label: String, dir: String): Unit = {
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); serve(dir): Unit
          (System.nanoTime() - t0) / 1e9
        }.sorted
        println(f"[probe] $label%-28s ${ts(1)}%.2f s (trials ${ts.map(x => f"$x%.2f").mkString(",")})")
      }
      med(s"serve with ${nSlices + 2} slices", idx)
      val dst = graft.core.TmpDirs.scoped("tickprobe_compacted")
      t("compactIncrementalIndex")(
        TextDedup.compactIncrementalIndex(spark, idx, dst))
      med("serve compacted (1 slice)", dst)
    }
    spark.stop()
  }
}
