package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.sources.CorpusIngest

/** JSONL corpus ingest: schema-enforced parse, corrupt-line
  * quarantine (never crash, never silently drop), parquet round-trip
  * fidelity, and the streaming landing-zone path.
  */
class CorpusIngestSpec extends SparkSpec {
  import spark.implicits._

  private def writeLines(lines: Seq[String]): String = {
    val f = Files.createTempFile("corpus", ".jsonl")
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  private val goodLines = Seq(
    """{"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "s0", "n_chars": 10}""",
    """{"doc_id": 2, "text": "uno dos", "lang": "es", "source": "s1", "n_chars": 7}""")

  test("good lines parse typed; torn/malformed lines quarantine with the raw text") {
    val torn = """{"doc_id": 3, "text": "tr"""
    val notJson = "plainly not json"
    val path = writeLines(goodLines :+ torn :+ notJson)
    val (good, quarantine) = CorpusIngest.readJsonl(spark, path)
    assert(good.columns.toSeq === Seq("doc_id", "text", "lang", "source", "n_chars"))
    assert(good.as[(Long, String, String, String, Long)].collect().toSet ===
      Set((1L, "alpha beta", "en", "s0", 10L), (2L, "uno dos", "es", "s1", 7L)))
    val q = quarantine.as[String].collect().toSet
    assert(q === Set(torn, notJson), s"quarantine must carry raw lines, got $q")
  }

  test("structurally valid JSON missing a required field quarantines, not nulls") {
    // {"doc_id": 10} parses clean under PERMISSIVE mode, but a doc
    // without text (or without an id) must hit the audit trail: a null
    // content key would collapse every such row into ONE under exact
    // dedup — the silent drop the quarantine contract forbids.
    val noText = """{"doc_id": 10, "lang": "en"}"""
    val noId = """{"text": "orphan words", "source": "s9"}"""
    val nullText = """{"doc_id": 11, "text": null, "lang": "en"}"""
    val sparseMeta = """{"doc_id": 12, "text": "kept fine"}"""
    val path = writeLines(goodLines ++ Seq(noText, noId, nullText, sparseMeta))
    val (good, quarantine) = CorpusIngest.readJsonl(spark, path)
    val goodIds = good.select("doc_id").as[Long].collect().toSet
    assert(goodIds === Set(1L, 2L, 12L),
      "missing lang/source/n_chars is tolerable; missing doc_id/text is not")
    assert(quarantine.as[String].collect().toSet === Set(noText, noId, nullText))
  }

  test("round-trip: documents parquet -> jsonl -> ingest is lossless") {
    val docs = Tables.documents(spark, sf0001)
    val dir = Files.createTempDirectory("jsonl").toString
    docs.coalesce(1).write.mode("overwrite").json(dir)
    val (good, quarantine) = CorpusIngest.readJsonl(spark, s"$dir/*.json")
    assert(quarantine.count() === 0)
    assert(good.count() === docs.count())
    assert(good.orderBy("doc_id").collect().toSeq ===
      docs.select("doc_id", "text", "lang", "source", "n_chars")
        .orderBy("doc_id").collect().toSeq)
  }

  test("streaming landing zone: files ingest incrementally, quarantine split per batch") {
    val dir = Files.createTempDirectory("landing")
    val goodOut = scala.collection.mutable.Set[Long]()
    val badOut = scala.collection.mutable.Set[String]()
    val q = CorpusIngest.streamJsonl(spark, dir.toString)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val (g, b) = CorpusIngest.split(batch)
        goodOut ++= g.select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
          .collect()
        badOut ++= b.as[String](org.apache.spark.sql.Encoders.STRING).collect()
        ()
      }
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      Files.writeString(dir.resolve("a.json"), goodLines.head)
      q.processAllAvailable()
      Files.writeString(dir.resolve("b.json"), goodLines(1) + "\nbroken {line")
      q.processAllAvailable()
      assert(goodOut.toSet === Set(1L, 2L))
      assert(badOut.toSet === Set("broken {line"))
    } finally q.stop()
  }

  test("CSV ingest: typed parse, quoted separators, one quarantine contract, header dropped") {
    val lines = Seq(
      "doc_id,text,lang,source,n_chars",       // header: layout, dropped
      """1,"alpha, beta",en,s0,11""",           // quoted embedded comma
      "2,uno dos,es,s1,7",
      "x,bad id type,en,s0,3",                 // type-corrupt doc_id
      "3,too,many,columns,here,extra",         // arity overflow
      "",                                      // blank
      "4,,en,s0,0")                            // missing required text
    val f = Files.createTempFile("corpus", ".csv")
    Files.writeString(f, lines.mkString("\n"))
    val (good, quarantine) = CorpusIngest.readCsv(spark, f.toString)
    assert(good.as[(Long, String, String, String, Long)].collect().toSet ===
      Set((1L, "alpha, beta", "en", "s0", 11L), (2L, "uno dos", "es", "s1", 7L)))
    val q = quarantine.as[String].collect().toSet
    assert(q === Set("x,bad id type,en,s0,3", "3,too,many,columns,here,extra",
      "", "4,,en,s0,0"), s"quarantine mismatch: $q")
    // TSV: same machinery through the sep option
    val t = Files.createTempFile("corpus", ".tsv")
    Files.writeString(t, "5\ttab text\ten\ts0\t8")
    val (tg, tq) = CorpusIngest.readCsv(spark, t.toString, sep = "\t")
    assert(tg.as[(Long, String, String, String, Long)].collect().toSeq ===
      Seq((5L, "tab text", "en", "s0", 8L)) && tq.isEmpty)
  }
}
