package graft.tools

import org.apache.spark.sql.DataFrame

/** Shared timing/forcing helpers for the standalone bench mains
  * (ReferenceShapeBench, ScaleCurveBench, DedupScaleBench). One copy so a
  * methodology fix lands everywhere at once; `graft.Bench` keeps its own
  * richer `timeMedian` (cache clearing + GC/load telemetry) because its
  * numbers feed the per-round BENCH artifact.
  */
private[graft] object BenchUtil {

  /** Force full evaluation through the noop sink — unlike `count()`,
    * Catalyst cannot prune projections or skip expression work. */
  def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def time(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  /** True midpoint median: even-length inputs average the two middle
    * elements (picking the upper-middle alone biases the stat upward). */
  def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.size
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** Locale-independent fixed-point rendering: `f"%.3f"` is
    * default-locale-sensitive and emits a comma decimal separator (=
    * invalid JSON) under e.g. de_DE. */
  def fmt3(x: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(x))

  /** Recursive delete for stale fixture/scratch dirs under /tmp. */
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
    ()
  }
}
