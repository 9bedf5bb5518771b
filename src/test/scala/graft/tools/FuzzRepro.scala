package graft.tools

import graft.sources.{NetCdf, NetCdfFixtures}

import scala.util.Random

/** Reproduce a FuzzSpec finding standalone: regenerate the seeded
  * mutation stream for one base and time the slow input.
  * args: <baseIndex> <mutationIndex> */
object FuzzRepro {
  private def mutate(r: Random, base: Array[Byte]): Array[Byte] = {
    val b = java.util.Arrays.copyOf(base, base.length)
    r.nextInt(6) match {
      case 0 =>
        var k = 1 + r.nextInt(8)
        while (k > 0) {
          val p = r.nextInt(b.length)
          b(p) = (b(p) ^ (1 << r.nextInt(8))).toByte
          k -= 1
        }
        b
      case 1 => java.util.Arrays.copyOf(b, r.nextInt(b.length + 1))
      case 2 =>
        val p = r.nextInt(b.length)
        val n = math.min(1 + r.nextInt(8), b.length - p)
        java.util.Arrays.fill(b, p, p + n, 0xFF.toByte); b
      case 3 =>
        val p = r.nextInt(b.length)
        val n = math.min(1 + r.nextInt(8), b.length - p)
        java.util.Arrays.fill(b, p, p + n, 0.toByte); b
      case 4 =>
        val n = 1 + r.nextInt(math.min(64, b.length))
        val from = r.nextInt(b.length - n + 1)
        val to = r.nextInt(b.length - n + 1)
        System.arraycopy(base, from, b, to, n); b
      case _ => b ++ Array.fill(1 + r.nextInt(64))(r.nextInt().toByte)
    }
  }

  def main(args: Array[String]): Unit = {
    val bases = Seq(
      "classic" -> NetCdfFixtures.classicGrid(),
      "hdf5" -> NetCdfFixtures.hdf5(),
      "hdf5Chunked" -> NetCdfFixtures.hdf5Chunked(),
      "hdf5V2" -> NetCdfFixtures.hdf5V2(),
      "hdf5V2Chunked" -> NetCdfFixtures.hdf5V2Chunked(),
      "hdf5V2EaBt2" -> NetCdfFixtures.hdf5V2EaBt2())
    val bi = args(0).toInt
    val mi = args(1).toInt
    val (name, base) = bases(bi)
    val r = new Random(0xF022C0DEL + bi * 7919)
    var input: Array[Byte] = null
    for (_ <- 0 to mi) input = mutate(r, base)
    println(s"$name mutation $mi: ${input.length} bytes")
    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      val res = NetCdf.parse(input)
      val t1 = System.nanoTime()
      res match {
        case Right(meta) =>
          println(f"round $round: parse OK ${(t1 - t0) / 1e6}%.0f ms, " +
            s"${meta.vars.size} vars")
          meta.vars.take(4).foreach { v =>
            val s0 = System.nanoTime()
            val g = NetCdf.readGridScaled(input, meta, v.path)
            val s1 = System.nanoTime()
            println(f"  read ${v.path}: ${(s1 - s0) / 1e6}%.0f ms " +
              s"-> ${g.map(_.length)}")
          }
        case Left(err) =>
          println(f"round $round: Left($err) ${(t1 - t0) / 1e6}%.0f ms")
      }
    }
  }
}
