package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.TextDedup

/** r19 probe: step-time the sub-frames of `jaccardPairsOn` (sizes, df,
  * prefix ranking, candidate self-join, verification) so the one hot
  * stage QueryJobProfile attributes to the eager localCheckpoint breaks
  * into its parts. Mirrors the operator internals on the same corpus.
  */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val spark = BenchUtil.scaleSession()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val tau = 0.8
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[jprobe] $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.3f s  rows=$n")
    }
    val sh = TextDedup.shingles(docs, 2, "doc_id").persist()
    t("sh count")(sh.count())
    t("sh count warm")(sh.count())
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    t("sizes")(sizes.count())
    val dfc = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    t("df")(dfc.count())
    val rare = sh.join(dfc, Seq("shingle")).join(sizes, Seq("doc_id"))
    t("rare")(rare.count())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))
    val prefix = rare
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= col("sz") - ceil(lit(tau) * col("sz")) + 1)
      .select(col("doc_id"), col("shingle"), col("sz"), col("rk"))
      .persist()
    t("prefix")(prefix.count())
    val candRaw = prefix.as("a")
      .join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id") &&
          col("b.sz") * lit(1.0) >= lit(tau) * col("a.sz") &&
          col("a.sz") * lit(1.0) >= lit(tau) * col("b.sz"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
    t("candidates raw")(candRaw.count())
    val candPos = prefix.as("a")
      .join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id") &&
          col("b.sz") * lit(1.0) >= lit(tau) * col("a.sz") &&
          col("a.sz") * lit(1.0) >= lit(tau) * col("b.sz") &&
          (least(col("a.sz") - col("a.rk"), col("b.sz") - col("b.rk")) + 1)
            .cast("double") + lit(1e-9) >=
            lit(tau / (1 + tau)) * (col("a.sz") + col("b.sz")))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
    t("cand positional raw")(candPos.count())
    val cand = candPos.distinct().persist()
    t("cand positional dist")(cand.count())
    // verify: sets + two joins + intersect
    val sets = sh.groupBy("doc_id")
      .agg(collect_list(col("shingle")).as("set"), count(lit(1)).as("sz"))
    t("sets")(sets.count())
    val verified = cand
      .join(sets.select(col("doc_id").as("d1"), col("set").as("set1"), col("sz").as("sz1")), Seq("d1"))
      .join(sets.select(col("doc_id").as("d2"), col("set").as("set2"), col("sz").as("sz2")), Seq("d2"))
      .withColumn("n_inter", size(array_intersect(col("set1"), col("set2"))))
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("sz1") + col("sz2") - col("n_inter")))
      .filter(col("jaccard") >= tau)
      .select("d1", "d2", "jaccard")
    t("verify")(verified.count())
    t("full op")( {
      TextDedup.jaccardPairs(docs, 2, tau, Long.MaxValue).count()
    })
    spark.stop()
  }
}
