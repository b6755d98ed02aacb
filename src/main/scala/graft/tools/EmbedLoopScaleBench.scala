package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Similarity
import graft.streaming.EmbedIngest

/** The embedding ingest loop at scale: seed a replicated vector corpus
  * into an IVF index, then run N `EmbedIngest.ingestTick`s and watch
  * the per-tick series for flatness. Fresh content per tick is the
  * corpus CYCLICALLY SHIFTED by a tick-dependent offset (a coordinate
  * permutation — preserves norms, scrambles directions, so cross-tick
  * cosines look random ~0±0.12 while exact copies stay cosine 1);
  * each tick also carries 10% exact dups of the SEED and 5% exact dups
  * of the PREVIOUS tick's fresh vectors (droppable only if the index
  * append really grew the corpus).
  *
  * Usage: runMain graft.tools.EmbedLoopScaleBench <sfDir> [reps] [ticks] [stride]
  */
object EmbedLoopScaleBench {
  import BenchUtil.fmt3

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(50)
    val ticks = args.lift(2).map(_.toInt).getOrElse(12)
    val stride = args.lift(3).map(_.toLong).getOrElse(500L)
    val spark = BenchUtil.scaleSession()

    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val corpusDir = graft.core.TmpDirs.scoped("eloop_corpus")
    BenchUtil.replicateExplode(emb, "vec_id", reps)
      .write.mode("overwrite").parquet(corpusDir)
    val corpus = spark.read.parquet(corpusDir)
    val nCorpus = corpus.count()

    val idx = graft.core.TmpDirs.scoped("eloop_idx")
    val out = graft.core.TmpDirs.scoped("eloop_out")
    val tBuild = BenchUtil.time(Similarity.writeIvfIndex(corpus, idx, stride))
    val nLists = spark.read.parquet(s"$idx/centroids").count()
    System.err.println(s"[eloop-bench] seed n=$nCorpus, $nLists lists, " +
      s"index build ${fmt3(tBuild)} s")

    // cyclic coordinate shift by (7i+1) mod dim — a per-tick permutation
    def fresh(i: Int): DataFrame = {
      val k = (7 * i + 1) % dim
      emb.select((col("vec_id") + lit(20000000L + i * 100000L)).as("vec_id"),
        concat(slice(col("embedding"), k + 1, dim - k),
          slice(col("embedding"), 1, k)).as("embedding"))
    }
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val counts = scala.collection.mutable.LinkedHashMap[String, Long]()
    (0 until ticks).foreach { i =>
      val seedDups = emb.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + lit(30000000L + i * 100000L)).as("vec_id"),
          col("embedding"))
      val prevDups =
        if (i == 0) fresh(0).limit(0)
        else fresh(i - 1).filter(col("vec_id") % 20 === 0)
          .withColumn("vec_id", col("vec_id") + lit(25000000L))
      val batch = fresh(i).unionByName(seedDups).unionByName(prevDups)
        .localCheckpoint()
      val t0 = System.nanoTime()
      val n = EmbedIngest.ingestTick(spark, batch, idx, out, s"b$i",
        tau = 0.8, nProbe = 2, centroidStride = stride)
      val dt = (System.nanoTime() - t0) / 1e9
      results(s"tick_$i") = dt
      counts(s"survivors_$i") = n
      System.err.println(f"[eloop-bench] tick $i%2d: ${fmt3(dt)} s, $n survivors")
    }

    // round-15 segment: bloat the slice count with tiny direct appends
    // (the long-running small-batch worst case), measure a tick on the
    // bloated index, then cross the in-loop maxSlices trigger
    // (EmbedIngest.compactIfNeeded) and watch the serving time reset.
    (0 until 60).foreach { j =>
      Similarity.appendIvfIndex(spark, fresh(1000 + j).limit(20), idx, s"s$j")
    }
    System.err.println(s"[eloop-bench] bloated index to slices=" +
      graft.core.FsPaths.countChildren(spark, s"$idx/lists", "batch="))
    val bloatBatch = fresh(ticks + 100).localCheckpoint()
    val tB = System.nanoTime()
    counts("survivors_bloated") = EmbedIngest.ingestTick(spark, bloatBatch,
      idx, out, s"b${ticks + 100}", tau = 0.8, nProbe = 2, centroidStride = stride)
    results("tick_bloated") = (System.nanoTime() - tB) / 1e9
    System.err.println(
      s"[eloop-bench] bloated tick ${fmt3(results("tick_bloated"))} s")
    (ticks + 1 to ticks + 3).foreach { i =>
      val batch = fresh(i).localCheckpoint()
      val tc = System.nanoTime()
      val compacted = EmbedIngest.compactIfNeeded(
        spark, idx, maxSlices = math.max(2, ticks / 2), currentTag = s"b$i")
      val dtc = (System.nanoTime() - tc) / 1e9
      val t0 = System.nanoTime()
      val n = EmbedIngest.ingestTick(spark, batch, idx, out, s"b$i",
        tau = 0.8, nProbe = 2, centroidStride = stride)
      val dt = (System.nanoTime() - t0) / 1e9
      results(s"auto_tick_$i") = dt
      if (compacted) results(s"auto_compact_$i") = dtc
      counts(s"auto_survivors_$i") = n
      System.err.println(f"[eloop-bench] auto tick $i%2d: ${fmt3(dt)} s" +
        (if (compacted) s" (in-loop compact ${fmt3(dtc)} s)" else "") +
        s", $n survivors, slices=" +
        graft.core.FsPaths.countChildren(spark, s"$idx/lists", "batch="))
    }

    val qs = (results.map { case (k, v) => "\"" + k + "\":" + fmt3(v) } ++
      counts.map { case (k, v) => "\"" + k + s"""\":$v""" })
      .mkString("{", ",", "}")
    println(s"""{"bench":"embed_loop_scale","corpus_n":$nCorpus,""" +
      s""""n_lists":$nLists,"reps":$reps,"ticks":$ticks,""" +
      s""""index_build_sec":${fmt3(tBuild)},"series":$qs}""")
    spark.stop()
  }
}
