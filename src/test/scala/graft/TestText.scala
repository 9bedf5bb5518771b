package graft

/** Shared deterministic text generators for specs and probe tools. */
object TestText {

  /** Deterministic APERIODIC letter soup (LCG) — a linear
    * `(i*7+s)%26` pattern repeats with period 26, planting real
    * 64-char self-repeats that confound span-dedup assertions. */
  def letters(len: Int, seed: Int): String = {
    var x = seed * 2654435761L + 1
    (0 until len).map { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      ('a' + ((x >>> 33) % 26)).toChar
    }.mkString
  }
}
