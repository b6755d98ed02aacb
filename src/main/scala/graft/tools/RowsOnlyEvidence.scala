package graft.tools

/** Machine-readable trust chains for the rows-only catalog queries.
  *
  * 14 of the 144 registered queries have no DuckDB-portable oracle
  * (xxhash64 sketches, ANN, BPE), so the driver's `CORRECTNESS_r{N}.json`
  * records them as `no_oracle` — indistinguishable from "unchecked" to a
  * reader of that file alone. Each such query IS pinned by a named
  * ScalaTest assertion that chains it to an oracle-checked exact variant
  * (COVERAGE.md "Trust chain" table); this object makes that chain
  * machine-readable: the pinning test calls [[record]] after its
  * assertions pass, which (re)writes `ROWSONLY_EVIDENCE.json` at the repo
  * root. A full `sbt test` therefore regenerates the file with every
  * entry `pass`; `RowsOnlyEvidenceSpec` keeps the registry, the catalog,
  * and the test sources from drifting apart.
  *
  * Partial runs (`testOnly`) merge with the on-disk file instead of
  * clobbering it, so evidence recorded by a previous full run survives;
  * `recorded_utc` exposes freshness.
  */
object RowsOnlyEvidence {

  /** One rows-only query's trust chain.
    *
    * @param query     catalog name (a `SparkEntry.queries` key w/o oracle SQL)
    * @param suite     fully-qualified pinning ScalaTest suite
    * @param assertion exact ScalaTest test name that pins the invariant —
    *                  [[record]] is called at the end of that test body
    * @param chainsTo  the oracle-checked variant(s) the assertion compares
    *                  against, outermost first; the LAST element is
    *                  DuckDB-hash-checked in `CORRECTNESS_r{N}.json`.
    *                  Empty = the assertion carries its own closed-form
    *                  oracle (hand-computed expected values in the spec).
    * @param invariant one-line statement of what the assertion proves
    */
  final case class Entry(
      query: String,
      suite: String,
      assertion: String,
      chainsTo: Seq[String],
      invariant: String)

  val registry: Seq[Entry] = Seq(
    Entry("ext_dedup_minhash", "graft.DedupSpec",
      "MinHash/LSH pairs (128 perms, r=4) equal the exact Jaccard pairs at tau=0.8",
      Seq("ext_dedup_jaccard"),
      "LSH-banded candidate pair set == the exact (oracle-checked) Jaccard pair set at tau=0.8; aggregator signatures bit-identical to the column-min form"),
    Entry("ext_dedup_simhash", "graft.DedupSpec",
      "SimHash(64) within hamming<=7 recalls the high-Jaccard pairs",
      Seq("ext_dedup_jaccard"),
      "recall >= 0.85 of the high-Jaccard (oracle-checked) pairs within hamming distance 7"),
    Entry("ext_ann_lsh", "graft.SimilaritySpec",
      "LSH pairs are a verified subset of brute force, with measured recall",
      Seq("ext_ann_cosine_pairs"),
      "LSH pairs are a subset of the brute-force (oracle-checked) cosine pairs; recall >= 0.9 multi-probe / >= 0.5 plain"),
    Entry("ext_ann_ivf", "graft.SimilaritySpec",
      "IVF top-k recall@10 vs exact top-k",
      Seq("ext_ann_topk"),
      "recall@10 vs the exact (oracle-checked) brute-force top-k"),
    Entry("ext_ann_ivf_indexed", "graft.SimilaritySpec",
      "persisted IVF index: probe results equal in-memory IVF; lists are partition dirs",
      Seq("ext_ann_ivf", "ext_ann_topk"),
      "probe over the on-disk index is result-identical to in-memory IVF (itself recall-pinned vs exact top-k); probe plan shows dynamic partition pruning on list_id"),
    Entry("ext_ann_pq", "graft.SimilaritySpec",
      "PQ ADC top-k with exact re-rank: recall@10 vs brute force",
      Seq("ext_ann_topk"),
      "recall@10 >= 0.6 vs exact (oracle-checked) top-k; every returned cosine equals the brute-force score (re-rank exact); codes/codebooks bit-identical across repartitionings"),
    Entry("ext_ann_ivf_pq", "graft.SimilaritySpec",
      "IVFPQ: probed-list ADC + exact re-rank — recall pinned, both scans pruned",
      Seq("ext_ann_topk"),
      "recall@10 vs exact (oracle-checked) top-k; re-rank scores exactly equal brute force; plan shows dynamic partition pruning on BOTH the code scan and the raw-list re-rank fetch"),
    Entry("ext_ann_ivf_pq_probe", "graft.SimilaritySpec",
      "ext_ann_ivf_pq_probe equals the build-included IVFPQ catalog query",
      Seq("ext_ann_ivf_pq", "ext_ann_topk"),
      "probe over the cross-process cached prebuilt index is result-identical to the build-included IVFPQ query (deterministic build), which is recall-pinned and re-rank-exact vs the oracle-checked exact top-k"),
    Entry("ext_sketch_cms", "graft.SketchesSpec",
      "count-min estimates dominate exact counts within the eps*N envelope",
      Seq("ext_heavy_hitters"),
      "estimate >= exact (oracle-checked heavy-hitter counts) and estimate - exact <= eps*N for every probed key"),
    Entry("ext_sketch_hll", "graft.SketchesSpec",
      "HLL: per-source estimates within 5% of exact; sharded union == one-pass global",
      Seq("a2_count_distinct"),
      "per-group estimates within 5% of the exact countDistinct recomputed in-spec (the oracle-checked A2 operator shape); sharded-union sketch == one-pass global sketch (merge identity)"),
    Entry("ext_semdedup", "graft.SemDedupSpec",
      "semDedup removals are a subset of the exact graph's, probe=3 recall >= 0.9",
      Seq("ext_dedup_embed"),
      "removals are a subset of the exact (oracle-checked) embedding-dedup removals at the same tau; probe=3 recall pinned; centroids bit-identical across repartitionings"),
    Entry("ext_bpe_merges", "graft.TextAndJsonSpec",
      "bpeMerges: closed-form merge order on the classic corpus",
      Seq.empty,
      "closed-form: exact merge order on the classic Sennrich corpus incl. count-tie lexicographic break; greedy leftmost non-overlap; minPairCount stop"),
    Entry("ext_bpe_encode", "graft.TextAndJsonSpec",
      "bpeEncode: replays the merge table in rank order, word boundaries are hard",
      Seq.empty,
      "closed-form: exact token sequence under a learned merge table; hard word boundaries; lossless concatenation back to the source characters"),
    Entry("ext_quality_model", "graft.QualityModelSpec",
      "trained classifier recovers planted separable labels; scoring is map-only",
      Seq.empty,
      "closed-form: planted vocabulary-separable labels recovered on a held-out set with accuracy >= 0.95; corpus scoring plan contains no Exchange (model rides with the plan, no shuffle/join)"),
    Entry("ext_dsir_select", "graft.CurationSpec",
      "dsirSelect: deterministic Gumbel-top-k, keys recomputed closed-form, hashed weights rank-track exact",
      Seq("ext_dsir_weights"),
      "selected set == independent top-k recomputation of log_w + inverse-Gumbel(seeded-hash) keys; hashed-bucket log_w rank-correlates with the exact (oracle-checked) feature weights; draw invariant under repartitioning"),
  )

  /** sbt forks the test JVM with cwd = repo root, so the artifact lands
    * next to CORRECTNESS_r{N}.json where the driver reads repo files. */
  val defaultPath = "ROWSONLY_EVIDENCE.json"

  private val recordedThisRun =
    scala.collection.mutable.LinkedHashMap.empty[String, String]

  /** Called by the pinning test AFTER its assertions pass (an assertion
    * failure throws first, so a failing pin never records). Rewrites the
    * artifact on every call — ordering of suites within `sbt test` is
    * irrelevant, the last record leaves the complete merged state. */
  def record(query: String): Unit = synchronized {
    require(registry.exists(_.query == query),
      s"record('$query') has no registry entry — add it to RowsOnlyEvidence.registry")
    recordedThisRun(query) = nowUtc
    write(defaultPath)
  }

  private def nowUtc: String =
    java.time.Instant.now().truncatedTo(java.time.temporal.ChronoUnit.SECONDS).toString

  /** `recorded_utc` of previously-passed entries from the on-disk file
    * (one JSON object per line — parsed with a line regex so a merge
    * never needs a JSON library on the main classpath). */
  private def parseExisting(path: String): Map[String, String] = {
    val f = new java.io.File(path)
    if (!f.exists()) return Map.empty
    val line = """"query"\s*:\s*"([^"]+)".*"status"\s*:\s*"pass".*"recorded_utc"\s*:\s*"([^"]*)"""".r.unanchored
    val src = scala.io.Source.fromFile(f, "UTF-8")
    try src.getLines().collect { case line(q, t) => q -> t }.toMap
    finally src.close()
  }

  private def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def write(path: String): Unit = synchronized {
    val prior = parseExisting(path)
    def when(e: Entry): Option[String] =
      recordedThisRun.get(e.query).orElse(prior.get(e.query))
    val lines = registry.map { e =>
      val status = if (when(e).isDefined) "pass" else "not-run"
      val chains = e.chainsTo.map(c => "\"" + esc(c) + "\"").mkString("[", ",", "]")
      s"""    {"query":"${esc(e.query)}","suite":"${esc(e.suite)}","assertion":"${esc(e.assertion)}","chains_to":$chains,"status":"$status","recorded_utc":"${esc(when(e).getOrElse(""))}","invariant":"${esc(e.invariant)}"}"""
    }
    val passed = registry.count(e => when(e).isDefined)
    val json =
      s"""{
         |  "_what": "Trust chains for catalog queries with no DuckDB-portable oracle (err=no_oracle in CORRECTNESS_r{N}.json). Each entry names the ScalaTest assertion that pins the query to an oracle-checked exact variant (chains_to, last element is DuckDB-hash-checked; empty = closed-form expected values in the spec). status=pass means that assertion executed without failure at recorded_utc; the file is rewritten by the pinning tests themselves during sbt test.",
         |  "total": ${registry.size},
         |  "passed": $passed,
         |  "entries": [
         |${lines.mkString(",\n")}
         |  ]
         |}
         |""".stripMargin
    val tmp = new java.io.File(path + ".tmp")
    val w = new java.io.PrintWriter(tmp, "UTF-8")
    try w.print(json) finally w.close()
    val dst = new java.io.File(path)
    if (dst.exists()) dst.delete()
    if (!tmp.renameTo(dst))
      System.err.println(s"[evidence] rename to $path failed")
  }
}
