package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query and prints ONE JSON line.
  *
  * The line records the PRIMARY config (driver env: SPARK_GRAFT_CPUS /
  * SPARK_GRAFT_SHUFFLE) and — unless disabled or redundant — a
  * `gate_config` object for the driver's correctness-gate shape
  * (local[4], shuffle=4), measured by stopping the context and re-running
  * the suite under that master in the same JVM. Both anchors then live in
  * the same BENCH artifact instead of one of them existing only as README
  * prose. Set SPARK_GRAFT_GATE_CONFIG=off (or a query subset via
  * SPARK_GRAFT_BENCH_ONLY) to skip the second run.
  */
object Bench {

  private final case class SuiteRun(total: Double, queries: Map[String, Double])

  /** Run the full (or filtered) suite under one master/shuffle config:
    * `passes` timed passes per query, min over the non-first samples when
    * possible (the first pays codegen + JIT).
    */
  private def runSuite(cpus: String, shuffle: String, sfDir: String,
      only: Option[Set[String]], passes: Int): SuiteRun = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // a failed query records -1, never its elapsed-until-crash time — a
    // near-zero "success" would hide the failure in the suite total
    def timeAll(): Map[String, Double] = names.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val t = try { fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => -1.0 }
      name -> t
    }.toMap
    // multiple passes: the first pays per-query codegen + JIT, so the min
    // is taken over the later steady-state samples (one sample is not
    // enough — a GC or compile tail in it inflates the whole suite). An
    // explicit GC between passes drops the previous pass's broadcast
    // blocks + codegen garbage so later passes aren't taxed for it.
    val sampled = (1 to passes).map { _ =>
      val t = timeAll(); System.gc(); t
    }
    val steady = if (sampled.length > 1) sampled.tail else sampled
    val results = names.map { case (name, _) =>
      name -> steady.map(_(name)).min
    }.toMap
    spark.stop()
    SuiteRun(if (results.nonEmpty) results.values.sum else 0.0, results)
  }

  private def queriesJson(qs: Map[String, Double]): String =
    qs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    // Optional comma-separated subset for local profiling (driver leaves
    // this unset → full suite).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val primary = runSuite(cpus, shuffle, sfDir, only, passes = 3)
    // the gate-shape anchor: skipped for subsets, when disabled, or when
    // the primary IS the gate shape already
    val gate =
      if (only.nonEmpty || sys.env.get("SPARK_GRAFT_GATE_CONFIG").contains("off")
          || (cpus == "4" && shuffle == "4")) None
      else Some(runSuite("4", "4", sfDir, only, passes = 2))
    val gateJson = gate.map(g =>
      s""","gate_config":{"cpus":4,"shuffle":4,"value":${g.total},"unit":"sec","queries":${queriesJson(g.queries)}}""")
      .getOrElse("")
    // Per-family subtotals (prefix before the first '_'; the parity core
    // is the q* family): as the suite grows past ~400 queries the 2×-of-
    // baseline gate stays interpretable per family, not only as a total.
    def famJson(qs: Map[String, Double]): String =
      qs.groupBy { case (k, _) =>
          if (k.matches("^q\\d+.*")) "q" // the reference-parity core
          else { val i = k.indexOf('_'); if (i > 0) k.substring(0, i) else k } }
        .toSeq.sortBy(_._1)
        .map { case (f, m) =>
          s"\"" + f + "\":" + (math.rint(m.values.sum * 1000) / 1000) }
        .mkString("{", ",", "}")
    val full = s"""{"metric":"total","value":${primary.total},"unit":"sec","queries":${queriesJson(primary.queries)},"families":${famJson(primary.queries)},"sf":"$sfDir","cpus":$cpus,"shuffle":$shuffle$gateJson}"""
    println(full)
    // The full line above exceeds tail-capturing harnesses (158 queries ×
    // two configs ≫ 2000 chars), so ALSO land it on disk and finish with a
    // <1 kB summary line: a truncated capture still has the headline
    // numbers, and the committed bench_out.json has every per-query time.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (full + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"bench_out write failed: $e") }
    def r3(d: Double) = math.rint(d * 1000) / 1000
    val slow = primary.queries.toSeq.sortBy(-_._2).take(10)
      .map { case (k, v) => s"\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    val gateTot = gate.map(g => s""","gate_total":${r3(g.total)}""").getOrElse("")
    println(s"""{"metric":"summary","value":${r3(primary.total)},"unit":"sec","n_queries":${primary.queries.size},"top10_slowest":$slow$gateTot,"full_json":"$outPath","sf":"$sfDir","cpus":$cpus,"shuffle":$shuffle}""")
  }
}
