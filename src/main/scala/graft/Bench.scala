package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional comma-separated subset for local profiling (driver leaves
    // this unset → full suite).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
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
    // three passes: the first pays per-query codegen + JIT, so the min is
    // taken over two steady-state samples (one sample is not enough — a
    // GC or compile tail in it inflates the whole suite). An explicit GC
    // between passes drops the previous pass's broadcast blocks + codegen
    // garbage so later passes aren't taxed for it.
    val passes = (1 to 3).map { _ =>
      val t = timeAll(); System.gc(); t
    }
    val results = names.map { case (name, _) =>
      name -> passes.map(_(name)).min
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
