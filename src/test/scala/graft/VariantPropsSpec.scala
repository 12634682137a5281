package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics

/** The VARIANT twin must be a drop-in for the string-path extraction —
  * same values on clean data (the shared oracle pins that), same
  * NULL degradation on dirty data (this spec pins that: parse_json
  * would THROW on malformed JSON where get_json_object returns NULL;
  * the twin uses try_parse_json for exact parity). */
class VariantPropsSpec extends SparkSuite {
  import spark.implicits._

  test("variant and string-path extraction agree, including on malformed JSON") {
    val rows = Seq(
      ("""{"k": 7}""", "clean"),
      ("""{"k": 7, "extra": [1,2]}""", "clean_extra"),
      ("""not json at all""", "malformed"),
      ("""{"k": """, "truncated"),
      ("""{"other": 1}""", "missing_key"),
      (null.asInstanceOf[String], "null_props"))
      .toDF("props", "tag")
    val got = rows.select($"tag",
      get_json_object($"props", "$.k").cast("int").as("s_k"),
      variant_get(try_parse_json($"props"), "$.k", "int").as("v_k"))
      .collect().map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2))))
    got.foreach { case (tag, s, v) =>
      assert(s == v, s"row '$tag': string-path $s != variant $v")
    }
    assert(got.collectFirst { case ("clean", s, _) => s }.flatten.contains(7))
    assert(got.collectFirst { case ("malformed", s, _) => s }.flatten.isEmpty)
  }

  test("gated twin queries return identical frames at sf0.001") {
    val sfDir = "/root/testdata/sf0.001"
    val a = Analytics.eventProps(spark, sfDir).collect().toSeq
    val b = Analytics.eventPropsVariant(spark, sfDir).collect().toSeq
    assert(a == b, s"twin drift:\n $a\n $b")
    assert(a.nonEmpty)
  }
}
