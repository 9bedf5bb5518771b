package graft.tools

import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Interleaved A/B probe of the r15 byte-walk `MinhashCore.wordHashes`
  * against the r14 regex/String chain (reconstructed VERBATIM below) —
  * same methodology as J1Probe/PrProbe: both variants run in one JVM,
  * alternating, so JIT and host-contention noise cancel. Also asserts
  * hash-identity on every probed text, which is the contract the
  * rewrite must keep (oracle hashes pin it end-to-end; this pins it
  * per-string, including the shingle fold path). */
object WordHashProbe {

  private val WS = java.util.regex.Pattern.compile("\\s+")

  /** The r14 implementation, verbatim. */
  def wordHashesOld(text: UTF8String): Array[Long] = {
    val s = WS.matcher(text.trim().toLowerCase().toString).replaceAll(" ")
    val t = s.trim()
    val words = t.split(" ", -1)
    val out = new Array[Long](words.length)
    var i = 0
    while (i < words.length) {
      out(i) = XxHash64Function.hash(
        UTF8String.fromString(words(i)), StringType, 42L)
      i += 1
    }
    out
  }

  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(7)
    val vocab = Array.tabulate(500)(i => s"word$i")
    val texts: Array[UTF8String] = Array.tabulate(20000) { _ =>
      val n = 20 + rnd.nextInt(180)
      val sb = new StringBuilder
      var i = 0
      while (i < n) {
        sb.append(vocab(rnd.nextInt(vocab.length)))
        sb.append(if (rnd.nextInt(20) == 0) "  \t" else " ")
        i += 1
      }
      UTF8String.fromString(sb.toString)
    } ++ Array("", "   ", " abc", "a  b", "Σ ΣΙΓΜΑ Σ",
      "mixed\tTABS and\nnewlines  here").map(UTF8String.fromString)

    // identity check on every text (and through the shingle fold)
    texts.foreach { t =>
      val a = graft.expr.MinhashCore.wordHashes(t)
      val b = wordHashesOld(t)
      require(java.util.Arrays.equals(a, b),
        s"hash mismatch on: ${t.toString.take(60)}")
    }
    println(s"identity: OK over ${texts.length} texts")

    var sinkA = 0L
    var sinkB = 0L
    for (round <- 1 to 6) {
      val t0 = System.nanoTime()
      texts.foreach(t => sinkA += graft.expr.MinhashCore.wordHashes(t).length)
      val t1 = System.nanoTime()
      texts.foreach(t => sinkB += wordHashesOld(t).length)
      val t2 = System.nanoTime()
      println(f"round $round: new ${(t1 - t0) / 1e6}%8.1f ms   old ${(t2 - t1) / 1e6}%8.1f ms")
    }
    println(s"(sinks: $sinkA $sinkB)")
  }
}
