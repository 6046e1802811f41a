package graft

import org.apache.spark.sql.functions._

import graft.etl.{TextAnalysis => TA}

/** Exact-recall property of deletion-neighborhood blocking: an equi-join
  * on [[TA.deletionKeys]] followed by a levenshtein ≤ 1 verify must find
  * EVERY pair at edit distance ≤ 1 — including insertions, which the
  * t47 registry fixture (substitution + deletion corruptions) doesn't
  * exercise. The ground truth is a brute-force all-pairs levenshtein
  * computed driver-side over the same small vocab.
  */
class FuzzyMatchSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Seq(
    "spark", "spars", "sparks", "shark", "sharp", // sub/del/ins cluster
    "table", "tale", "tables", "cable", // deletion + substitution
    "ab", "b", "a", // minimal lengths incl. delete-to-one-char
    "zzzz", "query") // isolated

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("deletion-key equi-join finds exactly the lev<=1 pairs (sub, del, ins)") {
    val truth = (for {
      a <- vocab; b <- vocab if a < b && lev(a, b) <= 1
    } yield (a, b)).toSet

    val df = vocab.toDF("w")
    val keyed = df.select(col("w"), explode(TA.deletionKeys(col("w"))).as("k"))
    val found = keyed.as("x").join(keyed.as("y"),
        col("x.k") === col("y.k") && col("x.w") < col("y.w"))
      .select(col("x.w"), col("y.w")).distinct()
      .filter(levenshtein(col("x.w"), col("y.w")) <= 1)
      .as[(String, String)].collect().toSet

    assert(found == truth,
      s"missing=${truth -- found} spurious=${found -- truth}")
    // sanity: the fixture really contains an insertion pair
    assert(truth.contains(("spark", "sparks")))
  }
}
