package graft

import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Checks every graft-registered SQL function name against Spark's
  * builtin registry (a collision means we'd shadow a built-in, as
  * `hll_union` did). Run: sbt "Test/runMain graft.ScratchBuiltins". */
object ScratchBuiltins {
  def main(args: Array[String]): Unit = {
    val builtin =
      org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin
    val ours = Seq("extract_dates", "shingle_hashes", "minhash_sig",
      "text_fingerprint", "simhash64", "cmr_geometry", "geometry_bbox",
      "vec_dot", "cosine_sim", "lsh_bucket", "minhash_union",
      "hll_sketch", "graft_hll_union", "hll_estimate",
      "kll_sketch", "kll_merge", "kll_quantile",
      "graft_bloom_agg", "graft_might_contain")
    val clashes = ours.filter(n =>
      builtin.functionExists(FunctionIdentifier(n)))
    println(s"collisions with Spark builtins: " +
      (if (clashes.isEmpty) "NONE" else clashes.mkString(", ")))
    require(clashes.isEmpty, s"builtin shadowing: $clashes")
  }
}
