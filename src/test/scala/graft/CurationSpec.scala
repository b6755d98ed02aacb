package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.ops.Curation

/** End-to-end curation semantics on the real corpus. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("curate drops near-dup non-keepers and low-quality docs, keeps the rest") {
    val docs = Tables.documents(spark, dir)
    val kept = Curation.curate(docs).cache()
    val keptIds = kept.select("doc_id").as[Long].collect().toSet
    assert(keptIds.nonEmpty && keptIds.size < docs.count())
    // no kept doc is a non-keeper of a near-dup cluster
    val losers = graft.ops.TextDedup.clusters(
        graft.ops.TextDedup.jaccardPairs(docs, 2, 0.8, Long.MaxValue))
      .filter($"cluster_id" =!= $"id").select($"id").as[Long].collect().toSet
    assert(losers.nonEmpty, "corpus has planted near-dups")
    assert((keptIds intersect losers).isEmpty)
    // every kept doc passes the gates
    assert(kept.filter($"n_words" < 20 || $"quality_score" < 0.3).count() == 0)
    kept.unpersist()
  }

  test("capPerDomain keeps exactly the top-N per source by (quality desc, id)") {
    val docs = Tables.documents(spark, dir)
    val capped = Curation.capPerDomain(docs, maxPerDomain = 3).cache()
    assert(capped.groupBy("source").count().filter($"count" > 3).count() == 0)
    val q = graft.ops.TextAnalysis.stats(docs)
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toMap
    val expected = docs.select("doc_id", "source").as[(Long, String)].collect()
      .groupBy(_._2).values
      .flatMap(ds => ds.map(_._1).sortBy(id => (-q(id), id)).take(3)).toSet
    assert(capped.select("doc_id").as[Long].collect().toSet == expected)
    capped.unpersist()
  }

  test("contaminated finds exactly the train docs sharing a k-gram with test docs") {
    val train = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "totally unrelated words here indeed")).toDF("doc_id", "text")
    val test = Seq((100L, "prefix alpha beta gamma delta epsilon suffix")).toDF("doc_id", "text")
    val got = Curation.contaminated(train, test, k = 5).as[Long].collect().toSet
    assert(got == Set(1L))
  }
}
