package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract: the embedding operators must be element-type agnostic.
  *
  * The corpus currently ships `embeddings.embedding` as `list<float>`, but
  * a regeneration with a different writer could flip it to `list<double>`
  * the same way `events.ts` flipped encodings (see TimestampEncodingSpec).
  * float→double promotion is exact, and every scoring path computes in
  * double (`VectorDot` promotes; the DuckDB oracles `CAST(... AS
  * DOUBLE[])`), so a double-encoded corpus must produce IDENTICAL results
  * — not merely close ones.
  */
class EmbeddingEncodingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ANN and k-means queries return identical rows for float and double corpora") {
    val src = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("emb_double")
    try {
      spark.read.parquet(s"$src/embeddings.parquet")
        .withColumn("embedding", col("embedding").cast("array<double>"))
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      for (q <- Seq("ext_ann_topk", "ext_kmeans_assign", "ext_dedup_embed")) {
        val onFloat = SparkEntry.queries(q)(spark, src).collect().map(_.toString).sorted
        val onDouble = SparkEntry.queries(q)(spark, dir.toString).collect().map(_.toString).sorted
        withClue(s"$q diverged on an array<double> embeddings corpus: ") {
          assert(onFloat.toSeq == onDouble.toSeq)
        }
      }
    } finally {
      java.nio.file.Files.walk(dir)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    }
  }
}
