package graft

import graft.llm.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale sanity for the round-6 continuation ops: CMS sketches over
  * 20x events (~2M rows), stars connected components over a 100k-doc
  * near-dup pair set, and the event-analytics aggregations (pivot /
  * funnel / retention) at 20x. Run:
  * sbt "Test/runMain graft.ScratchScaleR6d". */
object ScratchScaleR6d {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.1f s"); r
    }

    val factor = 20
    val e0 = Tables.t(spark, "/root/testdata/sf0.1", "events")
      .select("user_id", "event_type", "ts")
    val events = (0 until factor).map(i =>
      e0.select((col("user_id") + lit(i * 10000000L)).as("user_id"),
        col("event_type"), col("ts")))
      .reduce(_ unionByName _).persist()
    println(s"events: ${events.count()} rows")

    time("cms sketch+merge") {
      events.groupBy(pmod(col("user_id"), lit(32)).as("b"))
        .agg(expr("cms_sketch(event_type)").as("sk"))
        .agg(expr("cms_estimate(cms_merge(sk), 'click')")).collect()
    }
    time("pivot daily") {
      events.groupBy(to_date(col("ts")).as("day"))
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1))).count()
    }
    time("funnel") {
      def firstTs(t: String) =
        min(when(col("event_type") === t, col("ts"))).as(s"t_$t")
      events.groupBy("user_id")
        .agg(firstTs("view"), firstTs("click"), firstTs("purchase"))
        .select(when(col("t_view").isNull, 0)
          .when(col("t_click").isNull || col("t_click") <= col("t_view"), 1)
          .when(col("t_purchase").isNull ||
            col("t_purchase") <= col("t_click"), 2)
          .otherwise(3).as("stage"))
        .groupBy("stage").count().collect()
    }
    time("retention") {
      val e = events.select(col("user_id"), to_date(col("ts")).as("d"))
      val cohort = e.groupBy("user_id").agg(min(col("d")).as("c0"))
      e.join(cohort, "user_id")
        .select(floor(datediff(col("d"), col("c0")) / 7).as("wk"),
          col("user_id"))
        .distinct().groupBy("wk").count().collect()
    }
    events.unpersist()

    // 200k docs, realistic dup-family shape: 20 copies of the sf0.1
    // corpus with every WORD copy-tagged (cross-copy jaccard ~0 — no
    // shared shingles), each copy cloned once verbatim → families of 2
    val d0 = Tables.t(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text")
    val tagged = (0 until factor).map { i =>
      d0.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        array_join(transform(split(col("text"), "\\s+"),
          w => concat(lit(s"c$i"), w)), " ").as("text"))
    }.reduce(_ unionByName _)
    val docs = tagged.unionByName(tagged.select(
      (col("doc_id") + lit(5000000L)).as("doc_id"), col("text")))
    println(s"docs: ${docs.count()} rows")
    val pairs = time("minhash pairs 200k") {
      val p = Dedup.nearDuplicates(docs, "doc_id", "text",
        threshold = 0.9, k = 5, numHashes = 64, bands = 16)
        .select("id_a", "id_b").localCheckpoint(true)
      println(s"  pairs: ${p.count()}")
      p
    }
    time("stars CC 200k") {
      val cc = Dedup.connectedComponentsStars(pairs)
      println(s"  labeled: ${cc.count()}")
    }

    // adversarial shape: 40-token-salted copies leave cross-copy
    // jaccard ~0.8 — under the 0.9 threshold but inside LSH's
    // candidate region, so every base doc drags a 40-member borderline
    // family into the buckets (candidates quadratic in family size:
    // 1515 s with the exact verify eating all of it). The sig_agree
    // prefilter drops those candidates against 512 B signatures
    // before the KiB-scale shingle-set verify join.
    val salted = (0 until factor).map { i =>
      val salt = (0 until 40).map(j => s"salt${i}x$j").mkString(" ")
      d0.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        concat(col("text"), lit(" " + salt)).as("text"))
    }.reduce(_ unionByName _)
    val docsB = salted.unionByName(salted.select(
      (col("doc_id") + lit(5000000L)).as("doc_id"), col("text")))
    time("minhash borderline+pf") {
      val p = Dedup.nearDuplicates(docsB, "doc_id", "text",
        threshold = 0.9, k = 5, numHashes = 64, bands = 16,
        prefilterMargin = Some(0.15))
        .select("id_a", "id_b")
      println(s"  pairs: ${p.count()}")
    }
    spark.stop()
  }
}
