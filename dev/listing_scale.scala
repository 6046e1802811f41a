// Listing-at-object-store-scale probe (SCALE.md, round 14):
// times HeaderScan.listCsvFiles over the synthetic 1e5-file tree from
// dev/mk_listing_tree.py, three ways:
//   1. one plain root (driver globStatus + driver-side recursive walk)
//   2. a wide glob over the store= partitions (>=32 roots -> the
//      DISTRIBUTED per-root walk branch)
//   3. scanDirDistributed end-to-end (listing + executor head-scans)
// Pure ASCII (container locale). Run via dev/listing_scale.sh.
import org.apache.spark.sql.SparkSession

val root = sys.env.getOrElse("LISTING_TREE", "/tmp/listing_tree")
val sess = SparkSession.builder().master("local[32]")
  .config("spark.ui.enabled", "false").getOrCreate()
sess.sparkContext.setLogLevel("WARN")

def time[T](label: String)(body: => T): T = {
  val t0 = System.nanoTime()
  val r = body
  println(f"[listing] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
  r
}

// warm the filesystem metadata cache question away: run each twice,
// report both (first = cold-ish page cache, second = warm)
for (round <- Seq("cold", "warm")) {
  val plain = time(s"$round plainRoot")(
    graft.sources.HeaderScan.listCsvFiles(sess, root))
  println(s"[listing] $round plainRoot files=" + plain.size)
  val wide = time(s"$round wideGlob(store=*)")(
    graft.sources.HeaderScan.listCsvFiles(sess, s"$root/store=*"))
  println(s"[listing] $round wideGlob files=" + wide.size)
}
val infos = time("scanDirDistributed")(
  graft.sources.HeaderScan.scanDirDistributed(sess, root, keyCol = "store"))
println(s"[listing] headscans=" + infos.size)
sys.exit(0)
