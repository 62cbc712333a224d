package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions

class TextSpec extends AnyFunSuite with SparkSpec {

  // NOTE: the testdata's `lang` column is a synthetic label — the text
  // itself is the same English-ish vocabulary for every label — so
  // content-based accuracy against it is not measurable. The heuristic
  // is instead checked for determinism, label domain, and behavior on
  // text whose language IS knowable from content.
  test("lang-id is deterministic, stays in its label domain, and detects real signals") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val pred = TextFunctions.langId(docs)
    assert(pred.collect().sameElements(TextFunctions.langId(docs).collect()))
    val labels = pred.select("pred_lang").distinct().collect().map(_.getString(0)).toSet
    assert(labels.subsetOf(Set("en", "de", "fr", "es", "pt", "zh", "und")))
    // knowable-content probes through the same operator
    val probes = Seq(
      (1L, "the cat and the dog went to the market and it was full of the best things"),
      (2L, "der hund und die katze sind nicht zu hause und das ist ein problem"),
      (3L, "el perro y el gato es una historia que por las noches contamos con los niños"),
      (4L, "这是一个中文文档的例子其中包含了很多汉字用来测试语言识别"),
      (5L, "")).toDF("doc_id", "text")
    val out = TextFunctions.langId(probes).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "en")
    assert(out(2L) === "de")
    assert(out(3L) === "es")
    assert(out(4L) === "zh")
    assert(out(5L) === "und")
  }

  test("fingerprints are deterministic and length-sensitive") {
    val docs = Tables.documents(spark, sfDir)
    val fp1 = TextFunctions.fingerprints(docs).collect()
    val fp2 = TextFunctions.fingerprints(docs).collect()
    assert(fp1.sameElements(fp2))
    // distinct texts should essentially never collide at this size
    val distinctTexts = docs.select(lower(trim(col("text")))).distinct().count()
    val distinctFps = TextFunctions.fingerprints(docs).select("fp").distinct().count()
    assert(distinctFps >= distinctTexts - 1)
  }
}
