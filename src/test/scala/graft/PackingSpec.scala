package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.ops.Packing

/** Training-order layout: deterministic shuffle-shards and context
  * packing on the real corpus.
  */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = Tables.documents(spark, dir).select("doc_id", "text").cache()

  test("shuffleShards: dense 1..n positions per shard, all rows kept") {
    val sh = Packing.shuffleShards(docs, numShards = 4).cache()
    assert(sh.count() == docs.count())
    assert(sh.select("shard_id").distinct().as[Int].collect().toSet.subsetOf((0 until 4).toSet))
    // positions are exactly 1..count(shard) — dense, no gaps or dups
    val ok = sh.groupBy("shard_id")
      .agg(count(lit(1)).as("n"), min("shard_pos").as("mn"),
        max("shard_pos").as("mx"), countDistinct("shard_pos").as("nd"))
      .filter($"mn" === 1 && $"mx" === $"n" && $"nd" === $"n")
    assert(ok.count() == sh.select("shard_id").distinct().count())
  }

  test("shuffleShards: layout is a pure function of content — stable across reshards") {
    def layout(df: org.apache.spark.sql.DataFrame) =
      Packing.shuffleShards(df, numShards = 4)
        .select("doc_id", "shard_id", "shard_pos")
        .as[(Long, Int, Int)].collect().toSet
    assert(layout(docs) == layout(docs.repartition(7)))
  }

  test("pack: bin arithmetic matches a driver-side replay of the shard order") {
    val sized = docs.withColumn("n_words", size(split($"text", " ")))
    val packed = Packing.pack(sized, contextLen = 512, numShards = 4, sizeCol = "n_words")
      .select("shard_id", "shard_pos", "n_words", "bin_id", "bin_offset")
      .as[(Int, Int, Int, Long, Long)].collect()
    assert(packed.forall { case (_, _, _, _, off) => off >= 0 && off < 512 })
    packed.groupBy(_._1).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._2).foreach { case (_, _, n, binId, off) =>
        assert(binId == cum / 512 && off == cum % 512)
        cum += n
      }
    }
  }
}
