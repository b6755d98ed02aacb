package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Similarity

/** Micro-probe: rank-window vs mergeable-aggregate idioms for top-1 and
  * top-p per key on the exact SemDedup 16x shape (32k vectors x 160
  * centroids, 64-dim cosine scoring). */
object AggIdiomProbe {
  import BenchUtil.{force, fmt3}

  def main(args: Array[String]): Unit = {
    val spark = BenchUtil.scaleSession()
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select("vec_id", "embedding")
    val grown = emb
      .withColumn("__rep", explode(sequence(lit(0L), lit(15L))))
      .withColumn("embedding",
        transform(col("embedding"), (x, i) =>
          when(i === pmod(col("__rep"), lit(64)).cast("int"),
            x + lit(0.15f) * (lit(1.0f) + pmod(col("__rep"), lit(3)).cast("float")))
            .otherwise(x)))
      .withColumn("vec_id", col("vec_id") + col("__rep") * lit(2000L))
      .drop("__rep")
    val dir = graft.core.TmpDirs.scoped("aggprobe")
    grown.write.mode("overwrite").parquet(dir)
    val corpus = spark.read.parquet(dir)
    val centroids = Similarity.kmeansInitParallel(corpus, 160)
    centroids.write.mode("overwrite").parquet(s"$dir-c")
    val cents = spark.read.parquet(s"$dir-c")
    val s = spark

    def scored: DataFrame = corpus
      .crossJoin(broadcast(cents))
      .withColumn("c_cos", Similarity.cosine(s)(col("embedding"), col("c_emb")))

    def t(name: String)(df: => DataFrame): Unit = {
      val m = BenchUtil.medianTrials(spark, 3)(force(df))
      println(f"$name%-28s ${fmt3(m)} s")
    }

    t("top1 window") {
      scored.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
          .orderBy(desc("c_cos"), asc("c_id"))))
        .filter(col("rk") === 1)
        .select(col("vec_id"), col("embedding"), col("c_id"))
    }
    t("top1 max-struct+first") {
      scored.groupBy(col("vec_id"))
        .agg(first(col("embedding")).as("embedding"),
          max(struct(col("c_cos"), (-col("c_id")).as("nid"))).as("m"))
        .select(col("vec_id"), col("embedding"), (-col("m.nid")).as("c_id"))
    }
    t("top1 max-struct no-embed") {
      scored.groupBy(col("vec_id"))
        .agg(max(struct(col("c_cos"), (-col("c_id")).as("nid"))).as("m"))
        .select(col("vec_id"), (-col("m.nid")).as("c_id"))
    }
    t("top2 window") {
      scored.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
          .orderBy(desc("c_cos"), asc("c_id"))))
        .filter(col("rk") <= 2)
        .select(col("vec_id"), col("embedding"), col("c_id"))
    }
    // the kmeansInitParallel per-round priority scan (round-15 fix):
    // grouping by the array column forces a sort-based aggregate — the
    // exact idiom the top1 pair above measures at ~2x; the fixed form
    // groups by the scalar id and carries the embedding via first()
    t("seed-scan groupBy(id,emb)") {
      scored.groupBy(col("vec_id"), col("embedding"))
        .agg(max("c_cos").as("closest"))
    }
    t("seed-scan groupBy(id)+first") {
      scored.groupBy(col("vec_id"))
        .agg(first(col("embedding")).as("embedding"),
          max("c_cos").as("closest"))
    }
    t("top2 udaf TopBy") {
      val topby = udaf(new graft.functions.TopByAggregator(2),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
      scored.groupBy(col("vec_id"))
        .agg(first(col("embedding")).as("embedding"),
          topby(col("c_cos"), col("c_id")).as("cells"))
        .select(col("vec_id"), col("embedding"), explode(col("cells")).as("c"))
        .select(col("vec_id"), col("embedding"), col("c._2").as("c_id"))
    }
    spark.stop()
  }
}
