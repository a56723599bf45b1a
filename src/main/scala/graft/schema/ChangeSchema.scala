package graft.schema

import org.apache.spark.sql.types._

/** Explicit schemas for the reference's stream records.
  *
  * The reference declares its schema as TypedDicts and never infers it
  * (`utils.py:5-43`); we mirror that stance with explicit `StructType`s
  * handed to every reader (`spark.read.schema(change).json(...)`) — no
  * `inferSchema`, for determinism and so streaming sources have a fixed
  * schema from batch 0.
  */
object ChangeSchema {

  /** Kafka-style provenance envelope — reference `utils.py:5-15`. */
  val meta: StructType = StructType(Seq(
    StructField("domain", StringType),       // utils.py:7
    StructField("partition", IntegerType),   // utils.py:8
    StructField("uri", StringType),          // utils.py:9
    StructField("offset", LongType),         // utils.py:10
    StructField("topic", StringType),        // utils.py:11
    StructField("request_id", StringType),   // utils.py:12
    StructField("schema_uri", StringType),   // utils.py:13
    StructField("dt", StringType),           // utils.py:14 ISO-8601; to_timestamp at use
    StructField("id", StringType)))          // utils.py:15

  private val oldNew: StructType = StructType(Seq(
    StructField("old", LongType), StructField("new", LongType)))

  /** One RecentChanges event — reference `utils.py:18-36`. */
  val change: StructType = StructType(Seq(
    StructField("comment", StringType),            // utils.py:20
    StructField("wiki", StringType),               // utils.py:21
    StructField("type", StringType),               // utils.py:22 'edit'|'create'|'log'|...
    StructField("server_name", StringType),        // utils.py:23
    StructField("server_script_path", StringType), // utils.py:24
    StructField("namespace", IntegerType),         // utils.py:25
    StructField("title", StringType),              // utils.py:26
    StructField("bot", BooleanType),               // utils.py:27
    StructField("server_url", StringType),         // utils.py:28
    StructField("length", oldNew),                 // utils.py:29 closed keys {old,new}
    StructField("meta", meta),                     // utils.py:30
    StructField("user", StringType),               // utils.py:31
    StructField("timestamp", LongType),            // utils.py:32 unix seconds
    StructField("patrolled", BooleanType),         // utils.py:33
    StructField("id", LongType),                   // utils.py:34
    StructField("minor", BooleanType),             // utils.py:35
    StructField("revision", oldNew)))              // utils.py:36

  /** Sink/feedback record — reference `utils.py:39-43`: the output embeds
    * the full input row plus log-location provenance (nulls at LOG_LEVEL==2,
    * `scanner.py:162-165`).
    */
  val flagLogEntry: StructType = StructType(Seq(
    StructField("filter", StringType),             // utils.py:41
    StructField("change", change),                 // utils.py:42
    StructField("log", StructType(Seq(             // utils.py:43
      StructField("folder", StringType),
      StructField("file", StringType))))))
}
