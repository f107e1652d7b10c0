package graft

import org.apache.spark.sql.functions._

/** graft_text_gates (r19) replaces the spelled-out token plumbing of
  * the P7/P8/P51 gates — `size(split(lower(text),' '))`,
  * `size(array_distinct(…))` and four
  * `size(filter(…, t -> array_contains(…)))` higher-order calls —
  * with one codegen pass.  The swap is only sound if every field is
  * BIT-EQUAL to the expression it replaced, on exactly the token
  * semantics Spark's split gives (empty tokens from leading/trailing/
  * double spaces INCLUDED in n_tok and n_distinct), so this spec pins
  * the kernel against the original spelling over adversarial text:
  * space runs, empties, unicode uppercase, stopwords of several
  * languages in one doc, and the shared-word cases (la/de/un sit in
  * BOTH the es and fr lists and must count for both). */
class TextGatesSpec extends SparkSpec {

  private val stopLists = graft.functions.GraftFunctions.stopWords

  private def spelled(lang: String): String = {
    val lst = stopLists(lang).map(w => s"'$w'").mkString(", ")
    s"size(filter(split(lower(text), ' '), t -> array_contains(array($lst), t)))"
  }

  test("every struct field equals its spelled-out higher-order form") {
    import spark.implicits._
    val docs = Seq(
      "The quick brown fox and THE lazy dog in a field of rye",
      "der Hund und die Katze ist ein Tier zu den",
      "el la de que y en un es el la",
      "le la de et un une est dans",
      "  leading and trailing  ",
      "", " ", "  ",
      "la de un", // es ∩ fr shared words — must count for BOTH
      "ONE one One oNe", // distinct post-lower collapses to 1
      "naïve Ünïcode ÆØÅ ß İstanbul", // non-ASCII lowercase paths
      "a a a a a a a a",
      (1 to 300).map(i => s"tok$i").mkString(" ")
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
      .withColumn("tg", expr("graft_text_gates(text)"))
      .withColumn("ref_n_tok", expr("size(split(lower(text), ' '))"))
      .withColumn("ref_n_distinct",
        expr("size(array_distinct(split(lower(text), ' ')))"))
      .withColumn("ref_s_en", expr(spelled("en")))
      .withColumn("ref_s_de", expr(spelled("de")))
      .withColumn("ref_s_es", expr(spelled("es")))
      .withColumn("ref_s_fr", expr(spelled("fr")))
    val rows = df.select("doc_id", "tg.*", "ref_n_tok", "ref_n_distinct",
      "ref_s_en", "ref_s_de", "ref_s_es", "ref_s_fr").collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) === r.getInt(7), s"n_tok doc $id")
      assert(r.getInt(2) === r.getInt(8), s"n_distinct doc $id")
      assert(r.getInt(3) === r.getInt(9), s"s_en doc $id")
      assert(r.getInt(4) === r.getInt(10), s"s_de doc $id")
      assert(r.getInt(5) === r.getInt(11), s"s_es doc $id")
      assert(r.getInt(6) === r.getInt(12), s"s_fr doc $id")
    }
    assert(rows.length === docs.length)
  }

  test("null text yields a null struct, matching the spelled-out form") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String]), (2L, Some("the end")))
      .toDF("doc_id", "text")
      .withColumn("tg", expr("graft_text_gates(text)"))
      .withColumn("ref", expr("size(split(lower(text), ' '))"))
    val rows = df.select("doc_id", "tg", "ref").orderBy("doc_id").collect()
    assert(rows(0).isNullAt(1) && rows(0).isNullAt(2))
    assert(!rows(1).isNullAt(1))
  }
}
