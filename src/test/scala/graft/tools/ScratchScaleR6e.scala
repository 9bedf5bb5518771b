package graft

import graft.llm.{Dedup, Winnow}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale sanity for winnowing + edit-distance verify: the sf0.1
  * documents table cloned 20x (100k docs). The 2-word salt keeps the
  * copies from being byte-identical but long docs stay above 0.9
  * shingle-Jaccard, so LSH emits full 20-clone families (~190 pairs
  * each, ~690k total) — deliberately the quadratic-family worst case
  * from NOTES_r06, which the verify path must absorb. Run:
  * sbt "Test/runMain graft.ScratchScaleR6e". */
object ScratchScaleR6e {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.1f s"); r
    }

    val factor = 20
    val d0 = Tables.t(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text")
    // per-copy salt: copies are not byte-identical, but the shared
    // middle keeps cross-copy Jaccard >= 0.9 on long docs (full
    // families) and shared winnow fingerprints survive
    val docs = (0 until factor).map(i =>
      d0.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        concat(lit(s"salt$i "), col("text"), lit(s" tail$i")).as("text")))
      .reduce(_ unionByName _).persist()
    println(s"docs: ${docs.count()} rows")

    val fp = time("winnow fingerprints") {
      val f = Winnow.fingerprints(docs, "doc_id", "text").persist()
      println(s"  fingerprints: ${f.count()}")
      f
    }
    time("winnow pairs") {
      val n = Winnow.sharedFingerprintPairs(docs, "doc_id", "text",
        minShared = 3, maxDocFreq = 50).count()
      println(s"  pairs: $n")
    }
    fp.unpersist()
    time("incremental dedup") {
      // catalog = the 100k-doc corpus; batch = 5k salted clones +
      // 5k word-reversed non-dups. Catalog signatures computed once
      // here (in prod: read from parquet).
      val catSigs = Dedup.signatureCatalog(docs, "doc_id", "text",
        k = 5, numHashes = 64).persist()
      println(s"  catalog sigs: ${catSigs.count()}")
      val base = docs.filter(col("doc_id") < 10000000L)
      val batch = base.filter(pmod(col("doc_id"), lit(20)) === 0)
        .select((col("doc_id") + 900000000L).as("doc_id"),
          concat(lit("inc "), col("text")).as("text"))
        .unionByName(base.filter(pmod(col("doc_id"), lit(20)) === 3)
          .select((col("doc_id") + 910000000L).as("doc_id"),
            concat_ws(" ", reverse(split(col("text"), " "))).as("text")))
      val n = Dedup.nearDuplicatesAgainstCatalog(batch, "doc_id", "text",
        catSigs, docs, threshold = 0.9, k = 5, numHashes = 64,
        bands = 16).count()
      println(s"  flagged pairs: $n")
      catSigs.unpersist()
    }
    time("winnow incremental") {
      val base = docs.filter(col("doc_id") < 10000000L)
      val batch = base.filter(pmod(col("doc_id"), lit(20)) === 0)
        .select((col("doc_id") + 920000000L).as("doc_id"), col("text"))
      val catalog = Winnow.fingerprintCatalog(docs, "doc_id", "text",
        maxDocFreq = 50).persist()
      println(s"  catalog fps: ${catalog.count()}")
      val n = Winnow.matchAgainstCatalog(batch, "doc_id", "text",
        catalog, minShared = 3).count()
      println(s"  matches: $n")
      catalog.unpersist()
    }
    time("edit-distance verify") {
      val pairs = Dedup.nearDuplicates(docs, "doc_id", "text",
        threshold = 0.9, k = 5, numHashes = 64, bands = 16)
        .select("id_a", "id_b")
      val n = Dedup.editDistanceVerify(pairs, docs, "doc_id", "text").count()
      println(s"  verified pairs: $n")
    }
    spark.stop()
  }
}
