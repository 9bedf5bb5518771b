package graft

import graft.llm.Dedup
import org.apache.spark.sql.functions._

/** minhash_union sketch aggregate: min-of-mins over per-doc signatures
  * must equal the signature of the united shingle set — MinHash's
  * defining algebraic property, checked on real corpus data. */
class MinhashUnionSpec extends SparkSuite {
  import spark.implicits._

  test("group sketch == signature of the united shingle set") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select("lang", "doc_id", "text")
    // aggregate of per-doc signatures, per lang
    val sketches = docs
      .select(col("lang"),
        Dedup.minhashSignature(Dedup.shingleHashes(col("text"), 5), 32)
          .as("sig"))
      .groupBy("lang")
      .agg(call_function("minhash_union", col("sig")).as("sketch"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // reference: signature over the flattened distinct shingle union
    val direct = docs
      .select(col("lang"),
        explode(Dedup.shingleHashes(col("text"), 5)).as("h"))
      .groupBy("lang").agg(collect_set(col("h")).as("hs"))
      .select(col("lang"),
        Dedup.minhashSignature(col("hs"), 32).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(sketches.keySet == direct.keySet)
    sketches.foreach { case (lang, sk) =>
      assert(sk == direct(lang), s"sketch mismatch for lang=$lang")
    }
  }

  test("sketch similarity of a group with itself is 1; est in [0,1]") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val sk = docs.select(col("lang"),
      Dedup.minhashSignature(Dedup.shingleHashes(col("text"), 5), 64)
        .as("sig"))
      .groupBy("lang")
      .agg(call_function("minhash_union", col("sig")).as("sketch"))
    val pairs = sk.select(col("lang").as("l1"), col("sketch").as("s1"))
      .crossJoin(sk.select(col("lang").as("l2"), col("sketch").as("s2")))
      .withColumn("est",
        aggregate(zip_with(col("s1"), col("s2"),
          (a, b) => when(a === b, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / 64)
      .collect()
    pairs.foreach { r =>
      val (l1, l2, est) = (r.getString(0), r.getString(2),
        r.getDouble(r.fieldIndex("est")))
      if (l1 == l2) assert(est == 1.0)
      else assert(est >= 0.0 && est < 0.9, s"$l1 vs $l2 est=$est")
    }
  }
}
