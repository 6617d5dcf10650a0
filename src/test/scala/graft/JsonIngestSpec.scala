package graft

import graft.io.JsonIngest
import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class JsonIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  private def fixture(): String = {
    val dir = Files.createTempDirectory("graft_jsonl").toString
    Files.writeString(java.nio.file.Path.of(s"$dir/docs.jsonl"),
      """{"doc_id": 1, "text": "hello world", "lang": "en"}
        |{"doc_id": 2, "text": "bonjour le monde", "lang": "fr"}
        |{"doc_id": 3, "text": "truncated line, no closing brace
        |{"doc_id": "not a number", "text": "type mismatch", "lang": "xx"}
        |{"doc_id": 5, "text": "kept", "lang": "en"}
        |""".stripMargin)
    s"$dir/docs.jsonl"
  }

  test("whole-row malformed policy drops bad lines, projection-independent") {
    val df = JsonIngest.readJsonl(spark, fixture(), schema)
    // count() must see the SAME row set as a full projection (the
    // DROPMALFORMED pitfall this policy exists to avoid)
    assert(df.count() === 3)
    assert(df.select("doc_id").as[Long].collect().sorted === Array(1L, 2L, 5L))
    assert(df.schema.fieldNames.toSeq === Seq("doc_id", "text", "lang"))
  }

  test("dropMalformed=false keeps bad rows with partial/null fields") {
    val df = JsonIngest.readJsonl(spark, fixture(), schema, dropMalformed = false)
    val ids = df.select("doc_id").as[java.lang.Long].collect()
    assert(ids.length === 5, "every physical line surfaces as a row")
    assert(Set(1L, 2L, 5L).subsetOf(ids.filter(_ ne null).map(_.toLong).toSet),
      "well-formed rows keep their values")
    assert(ids.contains(null), "malformed lines surface as nulls, not dropped")
  }

  test("JSONL round-trip preserves rows and types; release handle unpersists") {
    val dir = Files.createTempDirectory("graft_jsonl_rt").toString
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select($"doc_id", $"text", $"lang")
    JsonIngest.writeJsonl(docs, s"$dir/out")
    val (back, release) = JsonIngest.readJsonlManaged(spark, s"$dir/out", schema)
    assert(back.count() === docs.count())
    val a = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val b = back.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(a === b)
    release()
  }
}
