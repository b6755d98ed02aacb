package graft.tools

/** Machine-readable trust chains for the rows-only catalog queries.
  *
  * The registry is EMPTY as of round 15: round 14 graduated 14 of the 15
  * former `no_oracle` queries to the DuckDB hash gate via verdict rows
  * ([[graft.queries.Verdicts]]), and round 15 graduated the last one —
  * `ext_bpe_merges` — by replaying the argmax-ordered merge loop itself
  * in DuckDB (one materialized CTE block per round,
  * `ExtQueries.bpeMergesOracleSql`). Every catalog query now carries a
  * full rows+schema+hash oracle, so `ROWSONLY_EVIDENCE.json` is retired;
  * the machinery stays so a future genuinely-non-SQL-expressible query
  * can re-register, and `RowsOnlyEvidenceSpec` keeps the registry equal
  * to the catalog's (now empty) no-oracle set.
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

  val registry: Seq[Entry] = Seq.empty

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
