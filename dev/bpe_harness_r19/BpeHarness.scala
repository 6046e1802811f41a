package graft.devscratch
// TEMPORARY dev scratch: synthetic-vocabulary BPE trainer benchmark.
// Run with the control jar FIRST on the classpath to time the r18
// rebuild-everything trainLocal, with the current jar first for the
// incremental one (graft.etl.Bpe resolves from whichever jar leads).
object BpeHarness {
  def main(args: Array[String]): Unit = {
    val nWords = if (args.length > 0) args(0).toInt else 100000
    val rounds = if (args.length > 1) args(1).toInt else 500
    // Zipf-ish synthetic vocabulary: composite "words" over a 26-letter
    // alphabet, lengths 3..12, counts ~ 1/rank — deterministic seed.
    val rnd = new scala.util.Random(20260819L)
    val hist: Seq[(String, Long)] = (0 until nWords).map { i =>
      val len = 3 + rnd.nextInt(10)
      val w = (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      (w, (nWords.toLong / (i + 1)) + 1L)
    }
    // warmup (JIT) on a small slice
    graft.etl.Bpe.trainLocal(hist.take(2000), math.min(rounds, 50))
    val t0 = System.nanoTime()
    val merges = graft.etl.Bpe.trainLocal(hist, rounds)
    val dt = (System.nanoTime() - t0) / 1e9
    // checksum so both implementations' outputs are comparable
    val sum = merges.map { case (r, a, b, f) =>
      (r.toLong * 31 + a.hashCode) * 31 + b.hashCode * 7 + f }.sum
    println(f"[bpeharness] words=$nWords rounds=$rounds " +
      f"merges=${merges.size} wall=$dt%.2f s checksum=$sum")
  }
}
