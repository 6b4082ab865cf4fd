package graft

import org.apache.spark.sql.functions._
import graft.functions.Normalize

/** PG-parity semantics of the reference's two SQL UDFs and the date
  * dispatch (SURVEY.md §2.6-2.7, FIXTURES.md synthetic fixtures). */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def normBody1(s: String): Option[String] =
    Seq(Option(s)).toDF("s").select(Normalize.normBody(col("s")))
      .collect().map(r => Option(r.getString(0))).head

  test("norm_body reference cases") {
    assert(normBody1("KLG4590") === Some("KLG-459"))
    assert(normBody1("BRT322-B") === Some("BRT-322"))
    assert(normBody1("BRT367") === Some("BRT-367"))
    assert(normBody1("BRT3296_A") === Some("BRT-329"))
  }

  test("norm_body NULL/guard cases (FIXTURES synthetic)") {
    assert(normBody1(null) === None)
    assert(normBody1("") === None)
    assert(normBody1("   ") === None)
    assert(normBody1("--!!") === None)          // no letters, no digits
    assert(normBody1("ab1") === None)           // <3 letters → NULL-propagating concat
    assert(normBody1("1234ABC") === Some("ABC-123")) // digits before letters
    assert(normBody1("klg4590") === Some("KLG-459")) // lowercased input
    assert(normBody1("ABCDEF") === None)        // letters but no digits
  }

  test("norm_body output shape: always ^[A-Z]{3}-[0-9]{3}$ or NULL (property)") {
    val gen = org.scalacheck.Gen.asciiPrintableStr
    org.scalacheck.Prop.forAll(gen) { s =>
      normBody1(s).forall(_.matches("^[A-Z]{3}-[0-9]{3}$"))
    }.check(org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(50))
  }

  test("to_bool_safe branch table (dag_datapelangan.py:58-66)") {
    val cases = Seq(
      "t" -> Some(true), "1" -> Some(true), "Y" -> Some(true), "yes" -> Some(true),
      "TRUE" -> Some(true), "FALSE" -> Some(false), "n" -> Some(false), "0" -> Some(false),
      "on" -> Some(true), "OFF" -> Some(false), // PG boolean-cast leniency
      "" -> None, "garbage" -> None, null.asInstanceOf[String] -> None)
    val in = cases.map(_._1).map(Option(_)).toDF("s")
    val out = in.select(Normalize.toBoolSafe(col("s"))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0)))
    assert(out.toSeq === cases.map(_._2))
  }

  test("date dispatch: ISO ok, dd/MM ok, single-digit month rejected") {
    val cases = Seq("2025-07-15", "15/07/2025", "7/30/2025", "30/13/2025", null)
    val out = cases.map(Option(_)).toDF("s")
      .select(date_format(Normalize.normDate(col("s")), "yyyy-MM-dd")).collect()
      .map(r => Option(r.getString(0)))
    assert(out.toSeq === Seq(
      Some("2025-07-15"), Some("2025-07-15"),
      None,              // M/D/YYYY rejected by ^\d{2}/\d{2}/\d{4}$ (faithful)
      None,              // regex passes but month 13 invalid → NULL (vs PG error; documented)
      None))
  }

  test("SQL surface: norm_body/to_bool_safe/norm_date callable from spark.sql, equal to the Column API") {
    val r = spark.sql(
      """SELECT norm_body('KLG4590') AS b1, norm_body('ab1') AS b2,
        |  to_bool_safe('no') AS f1, to_bool_safe('on') AS f2,
        |  CAST(norm_date('15/07/2025') AS STRING) AS d1,
        |  norm_date('7/30/2025') AS d2""".stripMargin).head()
    assert(r.getString(0) === "KLG-459")
    assert(r.isNullAt(1))
    assert(r.getBoolean(2) === false)
    assert(r.getBoolean(3) === true)
    assert(r.getString(4) === "2025-07-15")
    assert(r.isNullAt(5))
    // SQL registration and Column API are the same tree: identical
    // results over an arbitrary frame
    val in = Seq("BRT322-B", "x9", "", null).map(Option(_)).toDF("s")
    in.createOrReplaceTempView("sqlfn_in")
    val viaSql = spark.sql("SELECT norm_body(s) FROM sqlfn_in").collect()
      .map(r0 => Option(r0.getString(0))).toSeq
    val viaCol = in.select(Normalize.normBody(col("s"))).collect()
      .map(r0 => Option(r0.getString(0))).toSeq
    assert(viaSql === viaCol)
  }
}
