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

  test("default finite shingle-df cap agrees with the uncapped exact pairs here") {
    // the library default is the scale-safe finite cap; the catalog query
    // disables it for oracle identity — on this corpus (every shingle's
    // df is far below the cap) the two MUST coincide row-for-row, which
    // is what makes the default flip an optimization, not a semantic drift
    val docs = Tables.documents(spark, dir)
    val capped = Curation.curate(docs).cache()
    val uncapped = Curation.curate(docs, maxShingleDf = Long.MaxValue)
    assert(capped.count() > 0)
    assert(capped.exceptAll(uncapped).count() == 0)
    assert(uncapped.exceptAll(capped).count() == 0)
    capped.unpersist()
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

  test("resampleToMixture hits target token shares within one doc's tokens") {
    val docs = Tables.documents(spark, dir).select("doc_id", "source", "text")
    val shares = Map("src0" -> 0.3, "src1" -> 0.15, "src2" -> 0.05)
    val out = Curation.resampleToMixture(docs, shares).cache()
    val total = docs.select(size(split($"text", " "))).as[Int].collect().map(_.toLong).sum
    val gotTokens = out.groupBy("source").agg(sum("n_tok").as("t"))
      .as[(String, Long)].collect().toMap
    // every resampled domain's token mass lands near its target; the
    // fractional copy is all-or-nothing per doc, so the deviation is a
    // hash-keyed sum over docs — bounded here at 5% relative
    shares.foreach { case (src, w) =>
      val want = w * total
      assert(math.abs(gotTokens(src) - want) / want <= 0.05,
        s"$src: got ${gotTokens(src)} want $want")
    }
    // zero-share domains are dropped entirely
    assert(gotTokens.keySet == shares.keySet)
    // copies are dense 0..n_copies-1 per doc
    val badCopies = out.groupBy("doc_id").agg(
      count(lit(1)).as("n"), max("copy").as("mx"), min("copy").as("mn"),
      first("n_copies").as("nc"))
      .filter($"mx" =!= $"n" - 1 || $"mn" =!= 0 || $"nc" =!= $"n").count()
    assert(badCopies == 0)
    // deterministic: a second run is row-identical
    val again = Curation.resampleToMixture(docs, shares)
    assert(out.exceptAll(again).count() == 0 && again.exceptAll(out).count() == 0)
    out.unpersist()
  }

  test("blockFilter drops blocklisted domains and pattern matches, broadcast-anti") {
    val docs = Tables.documents(spark, dir)
    val blocked = Seq("src1", "src3").toDF("source")
    val kept = Curation.blockFilter(docs, blocked, Seq("slow +small"))
    kept.collect()
    val keptRows = kept.select("source").as[String].collect()
    assert(!keptRows.contains("src1") && !keptRows.contains("src3"))
    assert(kept.filter($"text".rlike("slow +small")).count() == 0)
    // non-vacuous: the pattern removed docs beyond the domain filter
    val domainOnly = docs.filter(!$"source".isin("src1", "src3")).count()
    assert(kept.count() < domainOnly)
    // the blocklist must never shuffle the corpus: broadcast anti join
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti join:\n$plan")
  }

  test("blockFilter keeps null-text docs (rlike(null) must not eat them)") {
    val docsN = Seq((1L, "srcA", "fine text"), (2L, "srcA", null), (3L, "srcB", "bad stuff"))
      .toDF("doc_id", "source", "text")
    val kept = Curation.blockFilter(docsN, Seq("srcZ").toDF("source"), Seq("bad"))
      .select("doc_id").as[Long].collect().toSet
    // doc 2 matches no rule — null text is not a blocklist hit
    assert(kept == Set(1L, 2L))
  }
}
