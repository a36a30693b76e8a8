package graft

/** Plan-economy audit: executes every query at sf0.001 and reports the
  * AQE-final scan and hash-exchange counts per table — the first place a
  * lost co-partitioning or an accidental second pass over a 100 TB input
  * shows up. Diagnostic output only (grep AUDIT); the hard per-query
  * assertions live in PlanShapeSpec.
  */
class AuditSpec extends SparkSuite {
  test("audit: scans and exchanges per query") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        df.collect() // execute THIS plan so AQE finalizes exchange reuse
        val full = df.queryExecution.executedPlan.toString
        val p = { // AQE prints Final + Initial; audit only the final
          val fi = full.indexOf("== Final Plan ==")
          val ii = full.indexOf("== Initial Plan ==")
          if (fi >= 0 && ii > fi) full.substring(fi, ii) else full
        }
        val fullScans = "FileScan parquet".r.findAllIn(p).size
        val ex = "Exchange hashpartitioning".r.findAllIn(p).size
        // table names per scan
        val tables = "sf0.001/(\\w+)\\.parquet".r.findAllMatchIn(p)
          .map(_.group(1)).toList.groupBy(identity).map{case(k,v)=>s"$k:${v.size}"}
          .toList.sorted.mkString(",")
        println(f"AUDIT $name%-22s scans=$fullScans ex=$ex [$tables]")
      } catch { case e: Throwable => println(s"AUDIT $name ERROR ${e.getMessage.take(60)}") }
    }
  }
}
