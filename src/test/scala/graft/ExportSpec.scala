package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.operators.Export

/** Shard export: deterministic assignment, one file per shard,
  * shuffle-rank row order inside each file, and exact round-trip of the
  * corpus through the writer.
  */
class ExportSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf0001)

  test("shard assignment is deterministic, in range, and independent of order") {
    val a = Export.shuffledShards(docs, 16)
      .select("doc_id", "shard", "shuffle_rank")
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    val b = Export.shuffledShards(docs.orderBy(col("doc_id").desc), 16)
      .select("doc_id", "shard", "shuffle_rank")
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq, "assignment must be a pure function of doc_id")
    assert(a.forall(r => r._2 >= 0 && r._2 < 16))
    // the ordering hash must not be the sharding hash in disguise —
    // otherwise in-shard order correlates with shard membership
    assert(a.exists(r => r._3 % 16 != r._2))
  }

  test("writeShards: one file per shard, every doc exactly once, rank-sorted rows") {
    val out = Files.createTempDirectory("graft_export").toString
    Export.writeShards(docs, out, 8)
    val shardDirs = Files.list(Paths.get(out)).toArray.map(_.toString)
      .filter(_.contains("shard=")).sorted
    assert(shardDirs.nonEmpty && shardDirs.length <= 8)
    shardDirs.foreach { d =>
      val parts = Files.list(Paths.get(d)).toArray.map(_.toString)
        .filter(_.endsWith(".parquet"))
      assert(parts.length === 1, s"$d must hold exactly one data file")
    }
    val back = spark.read.parquet(out)
    assert(back.count() === docs.count())
    assert(back.select("doc_id").distinct().count() === docs.count())
    // within one shard file, parquet preserves row order: it must be
    // (shuffle_rank, doc_id)-sorted
    val oneShard = back.filter(col("shard") === back.select("shard").head().getInt(0))
      .select("shuffle_rank", "doc_id").as[(Long, Long)].collect().toSeq
    assert(oneShard === oneShard.sortBy(identity))
  }

  test("appendShards: replay-safe ingest layers with batch-identical shard assignment") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val out = Files.createTempDirectory("graft_export_stream").toString
    val ck = Files.createTempDirectory("graft_export_ck").toString
    val in = MemoryStream[(Long, String)]
    def stream = in.toDF().toDF("doc_id", "text")
    in.addData((1L, "a b"), (2L, "c d"))
    assert(Export.appendShards(stream, out, 4, ck).awaitTermination(60000))
    in.addData((3L, "e f"))
    assert(Export.appendShards(stream, out, 4, ck).awaitTermination(60000))
    val back = spark.read.parquet(out)
    assert(back.columns.contains("ingest") && back.columns.contains("shard"))
    assert(back.select("doc_id").as[Long].collect().toSet === Set(1L, 2L, 3L),
      "each doc lands exactly once across the two ingest layers")
    // shard assignment must be the batch writer's, so batch-built and
    // continuously-ingested corpora share one layout
    val batchAssign = Export
      .shuffledShards(Seq((1L, "a b"), (2L, "c d"), (3L, "e f")).toDF("doc_id", "text"), 4)
      .select("doc_id", "shard").as[(Long, Int)].collect().toSet
    assert(back.select("doc_id", "shard").as[(Long, Int)].collect().toSet === batchAssign)
  }

  test("appendOrderedShards: frozen cuts bucket arrivals like the batch writer") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val out = Files.createTempDirectory("graft_ordexp_stream").toString
    val ck = Files.createTempDirectory("graft_ordexp_ck").toString
    // cuts derived ONCE from the full corpus (the frozen-boundary
    // contract), then two arrival waves bucket against them
    val keyed = docs.withColumn("ord_key",
      graft.operators.TextOps.subwordCount(
        graft.operators.TextOps.tokens(col("text"))).cast("long"))
    val cuts = Export.equiDepthCuts(keyed.select(col("ord_key")), "ord_key", 8)
    val all = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    val (w1, w2) = all.splitAt(all.length / 2)
    val in = MemoryStream[(Long, String)]
    def stream = in.toDF().toDF("doc_id", "text")
    in.addData(w1.toIndexedSeq)
    assert(Export.appendOrderedShards(stream, cuts, out, ck).awaitTermination(60000))
    in.addData(w2.toIndexedSeq)
    assert(Export.appendOrderedShards(stream, cuts, out, ck).awaitTermination(60000))
    val back = spark.read.parquet(out)
    assert(back.select("doc_id").as[Long].collect().toSet === all.map(_._1).toSet)
    // streamed shard assignment == the batch orderedShards assignment
    // (same cuts, same key), regardless of which wave a doc arrived in
    val streamed = back.select("doc_id", "shard").as[(Long, Int)].collect().toSet
    val batch = Export.orderedShards(docs, 8)
      .select("doc_id", "shard").as[(Long, Int)].collect().toSet
    assert(streamed === batch)
    // non-interleaving ranges hold WITHIN each ingest layer
    val ranges = back.groupBy(col("ingest").cast("string").as("ingest"), col("shard"))
      .agg(min(col("ord_key")).as("lo"), max(col("ord_key")).as("hi"))
      .orderBy(col("ingest"), col("shard"))
      .as[(String, Int, Long, Long)].collect()
    ranges.groupBy(_._1).values.foreach { layer =>
      layer.sortBy(_._2).sliding(2).foreach {
        case Array((_, s1, _, hi1), (_, s2, lo2, _)) =>
          assert(hi1 <= lo2, s"shard $s1 hi=$hi1 interleaves shard $s2 lo=$lo2")
        case _ => ()
      }
    }
  }

  test("a shard filter partition-prunes the export read to that shard's files") {
    val out = Files.createTempDirectory("graft_export_prune").toString
    Export.writeShards(docs, out, 8)
    val plan = spark.read.parquet(out).filter(col("shard") === 3)
      .queryExecution.executedPlan.toString
    // match INSIDE the PartitionFilters bracket: the FileScan line also
    // lists output attributes, which contain 'shard' even when nothing
    // was pushed — that match would make this test tautological
    assert("PartitionFilters: \\[[^\\]]*shard".r.findFirstIn(plan).isDefined,
      s"shard filter must reach the scan as a partition filter:\n$plan")
  }

  test("shards are balanced within a plausible envelope") {
    val sizes = Export.shuffledShards(docs, 16)
      .groupBy("shard").count().select("count").as[Long].collect()
    assert(sizes.length === 16, "every shard should be non-empty at 500 docs")
    // md5-based assignment of 500 docs into 16 shards: mean 31.25,
    // binomial sd ~5.4; a shard outside [10, 60] (~±4 sd) would mean
    // the hash is badly broken, not just unlucky
    assert(sizes.forall(n => n > 10 && n < 60), s"skewed shards: ${sizes.toSeq}")
  }

  test("writeOrderedShards: shard key-ranges never interleave (global order on disk)") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("ordshards").toString
    Export.writeOrderedShards(docs, dir, 16)
    val back = spark.read.parquet(dir)
    // every doc exactly once
    assert(back.count() === docs.count())
    assert(back.select("doc_id").distinct().count() === docs.count())
    // per-shard key ranges, in shard order, must be non-interleaving:
    // reading shard 0, 1, 2, ... in order replays a global key order
    val ranges = back.groupBy(col("shard"))
      .agg(min(col("ord_key")).as("lo"), max(col("ord_key")).as("hi"),
        count(lit(1)).as("n"))
      .orderBy(col("shard"))
      .as[(Int, Long, Long, Long)].collect()
    assert(ranges.nonEmpty && ranges.forall(_._4 > 0))
    ranges.sliding(2).foreach {
      case Array((s1, _, hi1, _), (s2, lo2, _, _)) =>
        assert(hi1 <= lo2, s"shard $s1 hi=$hi1 interleaves shard $s2 lo=$lo2")
      case _ => ()
    }
    // within a shard file, rows are sorted by (ord_key, doc_id): the
    // written row order IS the curriculum order, no reader-side sort
    val inFile = spark.read.parquet(s"$dir/shard=${ranges.head._1}")
      .select(col("ord_key"), col("doc_id")).as[(Long, Long)].collect().toSeq
    assert(inFile === inFile.sortBy(identity), "shard file rows not in (key, doc) order")
    // determinism: a second export byte-compares on VALUES (same
    // membership, same order)
    val dir2 = java.nio.file.Files.createTempDirectory("ordshards2").toString
    Export.writeOrderedShards(docs, dir2, 16)
    val a = back.orderBy("shard", "ord_key", "doc_id").collect()
    val b = spark.read.parquet(dir2).orderBy("shard", "ord_key", "doc_id").collect()
    assert(a.sameElements(b))
  }

  // minimal independent USTAR reader: parse (name, content) entries,
  // verifying each header checksum — a writer bug (bad octal, missing
  // padding, wrong magic) fails here, not in some downstream dataloader
  private def readTar(bytes: Array[Byte]): Seq[(String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var off = 0
    while (off + 512 <= bytes.length && bytes(off) != 0) {
      val h = bytes.slice(off, off + 512)
      assert(new String(h, 257, 5, "UTF-8") === "ustar", s"bad magic at $off")
      val stored = new String(h, 148, 8, "UTF-8").takeWhile(c => c >= '0' && c <= '7')
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      val sum = h.foldLeft(0)((a, b) => a + (b & 0xff))
      assert(Integer.parseInt(stored, 8) === sum, s"checksum mismatch at $off")
      val name = new String(h.takeWhile(_ != 0), "UTF-8")
      val size = Integer.parseInt(
        new String(h, 124, 12, "UTF-8").trim.takeWhile(_ != 0), 8)
      out += name -> new String(bytes, off + 512, size, "UTF-8")
      off += 512 + (size + 511) / 512 * 512
    }
    out.toSeq
  }

  test("writeTarShards: valid USTAR, rank-ordered entries, bit-identical re-export") {
    val docs = Tables.documents(spark, sf0001)
    val dir = Files.createTempDirectory("tarshards").toString
    Export.writeTarShards(docs, dir, 4)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tar"))
      .sortBy(_.getName)
    assert(files.map(_.getName).toSeq ===
      (0 until 4).map(i => f"shard-$i%05d.tar"), "one tar per shard")
    // expected membership + order from the ONE shared assignment
    val want = Export.shuffledShards(docs, 4)
      .select(col("shard"), col("shuffle_rank"), col("doc_id"), col("text"))
      .as[(Int, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(e => (e._2, e._3))).toMap
    var total = 0
    for (f <- files) {
      val shard = f.getName.stripPrefix("shard-").stripSuffix(".tar").toInt
      val entries = readTar(Files.readAllBytes(f.toPath))
      val expect = want(shard)
      assert(entries.map(_._1) === expect.map(e => s"${e._3}.txt").toSeq,
        s"shard $shard entry order diverged from the shuffle-rank order")
      assert(entries.map(_._2) === expect.map(_._4).toSeq,
        s"shard $shard contents diverged")
      total += entries.length
    }
    assert(total.toLong === docs.count(), "every doc exactly once")
    // bit-identical re-export (mtime 0, fixed metadata): same bytes
    val dir2 = Files.createTempDirectory("tarshards2").toString
    Export.writeTarShards(docs, dir2, 4)
    for (f <- files) {
      val g = Paths.get(dir2, f.getName)
      assert(java.util.Arrays.equals(Files.readAllBytes(f.toPath),
        Files.readAllBytes(g)), s"${f.getName} not bit-identical across exports")
    }
    // the engine reads its own export back losslessly (distributed
    // reader: binaryFile scan + checksum-verified tar walk)
    val back = Export.readTarShards(spark, dir)
      .select("doc_id", "text").as[(Long, String)].collect().toSet
    val orig = docs.select("doc_id", "text").as[(Long, String)].collect().toSet
    assert(back === orig, "tar round trip lost or altered documents")
  }

  test("tarEntry handles padding boundaries: exact-block, empty, unicode") {
    for (content <- Seq("x" * 512, "", "x" * 511, "x" * 513, "héllo 日本 😀")) {
      val bytes = Export.tarEntry("42.txt", content.getBytes("UTF-8")) ++
        new Array[Byte](1024)
      val entries = Export.readTarEntries(bytes)
      assert(entries.map(_._1) === Seq("42.txt"))
      assert(new String(entries.head._2, "UTF-8") === content,
        s"round trip broke at content length ${content.getBytes("UTF-8").length}")
      assert(bytes.length % 512 === 0, "archive not block-aligned")
    }
  }

  test("readTarEntries fails loudly on a tar truncated mid-payload") {
    // intact header, content bytes cut short: the header checksum still
    // verifies (it only covers the header), so without the explicit
    // bound this would yield a silently zero-padded document
    val full = Export.tarEntry("7.txt", ("y" * 600).getBytes("UTF-8"))
    val torn = full.take(512 + 300) // header + less content than `size` claims
    val e = intercept[IllegalArgumentException](Export.readTarEntries(torn))
    assert(e.getMessage.contains("truncated tar entry"), e.getMessage)
    // an archive torn ON a block boundary but before the declared size
    // must also fail, not just mid-block tears
    val blockTorn = full.take(512 + 512)
    val e2 = intercept[IllegalArgumentException](Export.readTarEntries(blockTorn))
    assert(e2.getMessage.contains("truncated tar entry"), e2.getMessage)
  }

  test("tarEntry name bound keeps the NUL terminator (99 ok, 100 rejected)") {
    val name99 = "n" * 96 + ".txt" // 100 bytes would fill the field entirely
    assert(name99.getBytes("UTF-8").length === 100)
    intercept[IllegalArgumentException](Export.tarEntry(name99, Array[Byte](1)))
    val ok = "n" * 95 + ".txt" // 99 bytes: field keeps its terminator
    val bytes = Export.tarEntry(ok, "z".getBytes("UTF-8")) ++ new Array[Byte](1024)
    assert(Export.readTarEntries(bytes).map(_._1) === Seq(ok),
      "99-byte name must read back exactly, not bleed into the mode field")
  }

  test("writeTarShards null text coerces to empty string by contract") {
    import spark.implicits._
    val docs = Seq((1L, "alpha"), (2L, null.asInstanceOf[String]), (3L, "gamma"))
      .toDF("doc_id", "text")
    val dir = Files.createTempDirectory("tarnull").toString
    Export.writeTarShards(docs, dir, 1)
    val back = Export.readTarShards(spark, dir)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(back(2L) === "", "null text must round-trip as empty string (documented)")
    assert(back(1L) === "alpha" && back(3L) === "gamma")
  }
}
