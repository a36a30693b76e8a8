package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.WorldBanksPipeline
import graft.pipeline.WorldBanksPipeline.Clock

/** End-to-end pipeline golden run, mirroring the reference's committed
  * notebook output (cell-5): first load inserts every row ("10/10",
  * "39/39"), an identical re-run produces only no-ops, and the enrichment
  * emits the declared MC_*_Billion columns (SQL:317-318).
  */
class PipelineSpec extends SparkSuite {
  import spark.implicits._

  private val clock = Clock(
    lit("2026-02-02 00:00:00").cast("timestamp"),
    lit("2026-02-02").cast("date"))

  private def rawBanks: DataFrame = Seq(
    ("  JPMorgan Chase ", " 599.93 "),
    ("Bank of America", "307.90"),
    ("HSBC", "160.00"),
  ).toDF("bank_name", "market_cap_usd")
    .withColumn("lastmod_text",
      lit("  This page was last edited on 21 August 2024, at 10:30  "))

  private def rawRates: DataFrame = Seq(
    (" United Kingdom ", "Pound", " 0.783 "),
    ("Euro Zone", "Euro", "0.924"),
    ("India", "Rupee", "82.572"),
    ("Japan", "Yen", "151.353"),
  ).toDF("country", "currency", "exchange_rate")

  private def emptyBankTarget: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("bank_name", StringType),
        StructField("market_cap_usd", DoubleType),
        StructField("last_modified_date", DateType),
        StructField("batch_id", StringType),
        StructField("active", BooleanType),
        StructField("updated_at", TimestampType))))

  private def emptyRateTarget: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("country", StringType),
        StructField("currency", StringType),
        StructField("year", DateType),
        StructField("exchange_rate", DoubleType),
        StructField("batch_id", StringType))))

  test("first run: every row inserts (the notebook's N/N golden pattern)") {
    val r = WorldBanksPipeline.run(spark, rawBanks, rawRates, "2024",
      emptyBankTarget, emptyRateTarget, clock, lit("b1"))
    val bc = r.bankCounters.collect().head
    assert(bc.getAs[Long]("new_inserts_count") == 3)
    assert(bc.getAs[Long]("no_update_count") == 0)
    assert(bc.getAs[Long]("update_count") == 0)
    val rc = r.rateCounters.collect().head
    assert(rc.getAs[Long]("new_inserts_count") == 4)
    // cleansing: trim + cast + lastmod parse (F1-F4, F9)
    val jp = r.worldBankData.filter(col("bank_name") === "JPMorgan Chase")
      .collect().head
    assert(jp.getAs[Double]("market_cap_usd") == 599.93)
    assert(jp.getAs[java.sql.Date]("last_modified_date").toString == "2024-08-21")
    // year synth (F6)
    assert(r.exchangeRates.select("year").distinct().collect()
      .head.getAs[java.sql.Date]("year").toString == "2024-12-31")
    assert(r.processLogs.count() == 3)
  }

  test("idempotent re-run: only no-ops, state unchanged") {
    val first = WorldBanksPipeline.run(spark, rawBanks, rawRates, "2024",
      emptyBankTarget, emptyRateTarget, clock, lit("b1"))
    val bankState = first.worldBankData.drop("change_type")
    val rateState = first.exchangeRates.drop("change_type")
    val second = WorldBanksPipeline.run(spark, rawBanks, rawRates, "2024",
      bankState, rateState, clock, lit("b1"))
    val bc = second.bankCounters.collect().head
    assert(bc.getAs[Long]("no_update_count") == 3)
    assert(bc.getAs[Long]("new_inserts_count") == 0)
    assert(bc.getAs[Long]("deactivate_count") == 0)
    val rc = second.rateCounters.collect().head
    assert(rc.getAs[Long]("no_update_count") == 4)
  }

  test("empty incoming batch: deactivation gate holds (C4)") {
    val first = WorldBanksPipeline.run(spark, rawBanks, rawRates, "2024",
      emptyBankTarget, emptyRateTarget, clock, lit("b1"))
    val bankState = first.worldBankData.drop("change_type")
    val out = WorldBanksPipeline.loadBanks(
      graft.pipeline.WorldBanksPipeline.cleanseBanks(
        rawBanks.limit(0), lit("b2")),
      bankState, clock, lit("b2"))
    assert(out.filter(col("change_type") === "deactivate").count() == 0)
    assert(out.filter(col("active") === true).count() == 3)
  }

  test("enrichment emits the declared MC_*_Billion columns") {
    val first = WorldBanksPipeline.run(spark, rawBanks, rawRates, "2024",
      emptyBankTarget, emptyRateTarget, clock, lit("b1"))
    val e = WorldBanksPipeline.enrich(
      first.worldBankData.filter(col("active")), first.exchangeRates)
    val jp = e.filter(col("bank_name") === "JPMorgan Chase").collect().head
    assert(jp.getAs[Double]("MC_GBP_Billion") == math.rint(599.93 * 0.783 * 100) / 100 ||
      jp.getAs[Double]("MC_GBP_Billion") == BigDecimal(599.93 * 0.783)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(e.columns.toSet.contains("MC_EUR_Billion"))
    assert(e.count() == 3)
  }

  test("permissive mode quarantines rows with failed casts (C2)") {
    val raw = Seq(
      ("GoodBank", "100.5"),
      ("BadCapBank", "not-a-number"),
    ).toDF("bank_name", "market_cap_usd")
      .withColumn("lastmod_text",
        lit("This page was last edited on 21 August 2024, at 10:30"))
    val cleansed = WorldBanksPipeline.cleanseBanks(raw, lit("b1"),
      keepRaw = true)
    val (good, quarantined) = WorldBanksPipeline.splitQuarantine(
      cleansed, Seq("market_cap_usd", "last_modified_date"), "bank_name")
    assert(good.count() == 1)
    val q = quarantined.collect()
    assert(q.length == 1)
    assert(q.head.getAs[String]("bank_name") == "BadCapBank")
    assert(q.head.getAs[String]("null_fields") == "market_cap_usd")
    // raw value preserved for review
    assert(q.head.getAs[String]("market_cap_usd") == "not-a-number")
  }

  test("quarantine: NULL/duplicate keys attribute each reject its OWN raw") {
    // two NULL-key raw rows plus a duplicate-key pair where only one row
    // fails: a key join-back would fan out (NULL <=> NULL matches both)
    // or attribute the FAILED row the parseable sibling's payload; the
    // carried raw columns keep attribution exact per row
    val raw = Seq(
      (null.asInstanceOf[String], "x"),
      (null.asInstanceOf[String], "y"),
      ("Bank A", "1000.5"),
      ("Bank A", "n/a"),
    ).toDF("bank_name", "market_cap_usd")
      .withColumn("lastmod_text",
        lit("This page was last edited on 21 August 2024, at 10:30"))
    val cleansed = WorldBanksPipeline.cleanseBanks(raw, lit("b1"),
      keepRaw = true)
    val (good, quarantined) = WorldBanksPipeline.splitQuarantine(
      cleansed, Seq("market_cap_usd"), "bank_name")
    assert(good.count() == 1) // the parseable Bank A row
    val q = quarantined.collect()
    assert(q.length == 3) // no fan-out: one record per rejected row
    assert(q.map(_.getAs[String]("market_cap_usd")).toSet ==
      Set("x", "y", "n/a")) // each reject shows ITS offending value
  }

  test("year sniffing picks the first 4-digit header (F5)") {
    assert(WorldBanksPipeline.sniffYear(
      Seq("Country", "Currency", "2024", "2023")).contains("2024"))
    assert(WorldBanksPipeline.sniffYear(Seq("Country", "abc")).isEmpty)
  }
}
