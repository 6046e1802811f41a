package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.HeaderScan

/** Byte-offset header-scan ingestion: dataStart accuracy under BOM and
  * CRLF line endings, and the grouped multi-path readDir (one scan per
  * distinct schema — the 10k-file scale path).
  */
class HeaderScanSpec extends SparkSpec {

  private def tmpDir(tag: String) = Files.createTempDirectory(s"hs_$tag")

  test("dataStart is byte-exact under UTF-8 BOM and CRLF endings") {
    val dir = tmpDir("offsets")
    // BOM + CRLF everywhere + multi-byte meta content
    val content = "﻿Report 報表,x\r\nstore,金額\r\ns1,10\r\ns2,20\r\n"
    Files.write(dir.resolve("crlf.csv"),
      content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val info = HeaderScan.scanHeader(spark, dir.resolve("crlf.csv").toString,
      keyCol = "store").get
    assert(info.prefixRows == Seq("Report 報表,x"))
    assert(info.columns == Seq("store", "金額"))
    // BOM(3) + "Report 報表,x"(9 + 3*2 ascii→ 報表 is 2 CJK chars × 3 bytes)
    // — assert against the authoritative computation, not hand arithmetic
    val headBytes = ("﻿Report 報表,x\r\nstore,金額\r\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8).length
    assert(info.dataStart == headBytes)
    val rows = HeaderScan.readFile(spark, info).orderBy("store").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("s1", "10"), ("s2", "20")))
  }

  test("CR-only line endings terminate lines like Hadoop's reader does") {
    val dir = tmpDir("cr")
    Files.write(dir.resolve("mac.csv"),
      "meta,x\rstore,v\rs1,1\rs2,2\r"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val info = HeaderScan.scanHeader(spark, dir.resolve("mac.csv").toString,
      keyCol = "store").get
    assert(info.prefixRows == Seq("meta,x") && info.columns == Seq("store", "v"))
    assert(info.dataStart == "meta,x\rstore,v\r".getBytes.length)
    val rows = HeaderScan.readFile(spark, info).orderBy("store").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("s1", "1"), ("s2", "2")))
  }

  test("relative input path reads correctly (qualified offset keys)") {
    val dir = tmpDir("rel")
    Files.writeString(dir.resolve("r.csv"), "store,v\na,1\n")
    val cwd = java.nio.file.Paths.get("").toAbsolutePath
    val rel = cwd.relativize(dir.resolve("r.csv")).toString
    val info = HeaderScan.scanHeader(spark, rel, keyCol = "store").get
    assert(HeaderScan.readFile(spark, info).count() == 1)
  }

  test("distributed dir scan ≡ driver-side scanHeader per file") {
    val dir = tmpDir("dist")
    // a mix that exercises every offset case: BOM+CRLF, CR-only, plain,
    // multi-meta-row, and a keyless file that must be warn-skipped
    Files.write(dir.resolve("a.csv"),
      "﻿Report 報表,x\r\nstore,金額\r\ns1,10\r\n"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.write(dir.resolve("b.csv"),
      "meta,x\rstore,v\rs1,1\r".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.writeString(dir.resolve("c.csv"), "store,v\na,1\n")
    Files.writeString(dir.resolve("d.csv"), "m1,x\nm2,y\nstore,w\nb,2\n")
    Files.writeString(dir.resolve("nokey.csv"), "foo,bar\n1,2\n")
    val dist = HeaderScan.scanDirDistributed(spark, dir.toString, keyCol = "store")
    val driver = Seq("a.csv", "b.csv", "c.csv", "d.csv", "nokey.csv")
      .flatMap(f => HeaderScan.scanHeader(spark, dir.resolve(f).toString,
        keyCol = "store"))
    // same files found (keyless skipped), same offsets, same headers —
    // the executor path and the driver path run the SAME scanStream,
    // and this pins that they cannot drift
    assert(dist.map(_.path.stripPrefix("file:")).sorted ==
      driver.map(_.path).sorted)
    val byName = dist.map(i => new java.io.File(i.path).getName -> i).toMap
    driver.foreach { d =>
      val e = byName(new java.io.File(d.path).getName)
      assert(e.dataStart == d.dataStart, s"${d.path}: offset drift")
      assert(e.columns == d.columns && e.prefixRows == d.prefixRows)
      assert(e.skipLines == d.skipLines)
    }
    assert(dist.size == 4) // nokey.csv skipped in the executors too
  }

  test("recursive listing + glob: nested lake tree, hidden dirs excluded") {
    val dir = tmpDir("tree")
    // ingest/2025/{07,08}/… date-partitioned layout + a root-level file,
    // a hidden staging dir, an underscore marker, and an uppercase .CSV
    def put(rel: String, body: String): Unit = {
      val p = dir.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, body)
    }
    put("root.csv", "store,v\nr1,1\n")
    put("_flat.csv", "store,v\nu1,7\n") // warn-skipped: Hadoop can't read it
    put("2025/07/j1.csv", "meta\nstore,v\na,1\n")
    put("2025/07/j2.CSV", "store,v\nb,2\n")
    put("2025/08/k1.csv", "store,v\nc,3\n")
    put("2025/08/deep/k2.csv", "store,v\nd,4\n")
    put(".staging/tmp.csv", "store,v\nx,9\n")
    put("_meta/marker.csv", "store,v\ny,9\n")
    put("2025/08/deep/_partial.csv", "store,v\nz,9\n")

    // the reference's scandir would ingest _flat.csv from a flat input
    // dir, but Hadoop input formats hard-filter ./_-prefixed paths
    // (FileInputFormat hiddenFileFilter — spark.read.csv can't see them
    // either), so the listing warn-skips it rather than returning a
    // path the data plane would then refuse; hidden names BELOW the
    // root are lake state and skip silently
    val all = HeaderScan.listCsvFiles(spark, dir.toString)
      .map(p => dir.toUri.relativize(new java.io.File(
        p.stripPrefix("file:")).toURI).getPath)
    assert(all == Seq("2025/07/j1.csv", "2025/07/j2.CSV", "2025/08/deep/k2.csv",
      "2025/08/k1.csv", "root.csv"),
      s"recursive listing mismatch: $all")

    // glob: only the 08 partition — each directory match is itself a
    // scan root (direct children loose, deeper levels strict)
    val aug = HeaderScan.listCsvFiles(spark, s"$dir/2025/0[8]")
      .map(_.split('/').last)
    assert(aug.sorted == Seq("k1.csv", "k2.csv"))
    // glob matching FILES directly
    val j = HeaderScan.listCsvFiles(spark, s"$dir/2025/07/j*.csv")
      .map(_.split('/').last)
    assert(j == Seq("j1.csv")) // j2.CSV not matched by lowercase glob

    // distributed ≡ driver pin extended over the nested tree
    val dist = HeaderScan.scanDirDistributed(spark, dir.toString, keyCol = "store")
    val driver = all.flatMap(rel => HeaderScan.scanHeader(
      spark, dir.resolve(rel).toString, keyCol = "store"))
    assert(dist.size == driver.size && dist.size == 5)
    dist.sortBy(_.path).zip(driver.sortBy(_.path)).foreach { case (e, d) =>
      assert(e.dataStart == d.dataStart && e.columns == d.columns &&
        e.prefixRows == d.prefixRows && e.skipLines == d.skipLines)
    }

    // readDir over the tree: every non-hidden row, none from hidden dirs
    val rows = HeaderScan.readDir(spark, dir.toString, keyCol = "store")
      .select("store").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().sorted
    assert(rows.toSeq == Seq("a", "b", "c", "d", "r1"))
  }

  test("nonexistent plain path fails loudly; empty glob returns empty") {
    val dir = tmpDir("missing")
    // a typo'd plain ingest path must throw (pre-r13 listStatus behavior,
    // restored deliberately) — an empty Seq would make the typo look like
    // an empty lake and every downstream stage would silently no-op
    intercept[java.io.FileNotFoundException] {
      HeaderScan.listCsvFiles(spark, s"$dir/no_such_subdir")
    }
    // a glob matching nothing is legal (empty lake partition): empty
    // result, driver-side warning only
    assert(HeaderScan.listCsvFiles(spark, s"$dir/2024/0[1-9]").isEmpty)
  }

  test("readDir groups same-schema files into one scan, unions the rest") {
    val dir = tmpDir("grouped")
    // two files share schema (a) with DIFFERENT prefix depths; one file
    // has schema (b); one decoy has no key column
    Files.writeString(dir.resolve("a1.csv"), "meta\nstore,v\ns1,1\ns2,2\n")
    Files.writeString(dir.resolve("a2.csv"), "m1\nm2,x\nstore,v\ns3,3\n")
    Files.writeString(dir.resolve("b.csv"), "store,w\ns4,4\n")
    Files.writeString(dir.resolve("decoy.csv"), "p,q\n1,2\n")

    val infos = HeaderScan.scanDir(spark, dir.toString, keyCol = "store")
    assert(infos.map(_.path.split('/').last) == Seq("a1.csv", "a2.csv", "b.csv"))
    assert(infos.map(_.dataStart).forall(_ > 0))

    val df = HeaderScan.readDir(spark, dir.toString, keyCol = "store")
    // plan size ∝ distinct schemas: 2 groups → exactly 2 leaf scans
    assert(df.queryExecution.optimizedPlan.collectLeaves().length == 2)
    val rows = df.orderBy("store")
      .select("store", "v", "w", "_src").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(rows.toSeq == Seq(
      ("s1", "1", null, "a1.csv"),
      ("s2", "2", null, "a1.csv"),
      ("s3", "3", null, "a2.csv"),
      ("s4", null, "4", "b.csv")))
  }

  test("property: random endings × BOM × prefix depth round-trip exactly") {
    val rng = new scala.util.Random(42)
    val dir = tmpDir("prop")
    val expected = scala.collection.mutable.Map.empty[String, Seq[(String, String)]]
    (0 until 8).foreach { i =>
      val ending = Seq("\n", "\r\n", "\r")(rng.nextInt(3))
      val bom = if (rng.nextBoolean()) "﻿" else ""
      val nPrefix = rng.nextInt(4)
      val rows = (0 until 1 + rng.nextInt(5))
        .map(r => (s"k${i}_$r", rng.nextInt(1000).toString))
      val content = bom +
        ((0 until nPrefix).map(p => s"meta$p,junk 標題") ++
          Seq("store,v") ++ rows.map { case (k, v) => s"$k,$v" })
          .mkString("", ending, ending)
      val name = s"f$i.csv"
      java.nio.file.Files.write(dir.resolve(name),
        content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      expected(name) = rows
    }
    val df = HeaderScan.readDir(spark, dir.toString, keyCol = "store")
    val got = df.select("store", "v", "_src").collect()
      .map(r => (r.getString(2), (r.getString(0), r.getString(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
    assert(got == expected.view.mapValues(_.sortBy(_._1)).toMap)
  }

  test("grouped read keeps per-file dataStart (different prefix depths)") {
    val dir = tmpDir("depths")
    Files.writeString(dir.resolve("p0.csv"), "store,v\nx1,1\n")
    Files.writeString(dir.resolve("p3.csv"), "m\nm\nm\nstore,v\nx2,2\n")
    val df = HeaderScan.readDir(spark, dir.toString, keyCol = "store")
    val got = df.select("store", "v").orderBy("store").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("x1", "1"), ("x2", "2")))
  }
}
