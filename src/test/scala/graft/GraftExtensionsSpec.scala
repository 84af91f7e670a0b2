package graft

/** SQL-surface contract: the native expressions are callable by name from
  * `spark.sql`, agreeing with their Column-API forms. */
class GraftExtensionsSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftExtensions.register(spark)
  }

  test("dot_long from SQL matches the exact integer dot product") {
    val r = spark.sql(
      "SELECT dot_long(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d").head()
    assert(r.getLong(0) == 32L)
  }

  test("shingle_explode from SQL yields one row per n-shingle") {
    val rows = spark.sql(
      """SELECT s FROM (SELECT array('a','b','c','d') AS t)
        |LATERAL VIEW shingle_explode(t, 2) AS s""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(rows == Seq("a b", "b c", "c d"))
  }

  test("shingle_explode_pos from SQL yields (pos, shingle) rows") {
    val rows = spark.sql(
      """SELECT pos, s FROM (SELECT array('a','b','c','d') AS t)
        |LATERAL VIEW shingle_explode_pos(t, 2) AS pos, s""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((0L, "a b"), (1L, "b c"), (2L, "c d")))
  }

  test("cos_top_k from SQL ranks (score desc, id asc) per group") {
    val rows = spark.sql(
      """SELECT g, inline(cos_top_k(c, i, 2))
        |FROM VALUES (0, 0.5, 10L), (0, 0.9, 11L), (0, 0.9, 7L), (0, 0.1, 3L),
        |            (1, 0.2, 1L) AS t(g, c, i)
        |GROUP BY g ORDER BY g, rnk""".stripMargin).collect()
    val got = rows.map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq((0, 1, 7L, 0.9), (0, 2, 11L, 0.9), (1, 1, 1L, 0.2)))
  }

  test("morton2 from SQL equals the reference interleave and the Column form") {
    val r = spark.sql("SELECT morton2(5L, 9L) AS m, morton2(1234L, 56789L) AS n").head()
    assert(r.getLong(0) == graft.functions.ZOrder.morton2Ref(5L, 9L))
    assert(r.getLong(1) == graft.functions.ZOrder.morton2Ref(1234L, 56789L))
  }

  test("shannon_entropy from SQL matches the Column-API UDAF") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(1L, 1L, 2L, 3L).toDF("x")
    df.createOrReplaceTempView("ent_in")
    val viaSql = spark.sql("SELECT shannon_entropy(x) AS h FROM ent_in").head().getDouble(0)
    val viaCol = df.agg(graft.functions.ShannonEntropy.ofLong(col("x"))).head().getDouble(0)
    assert(viaSql == viaCol)
    assert(math.abs(viaSql - 1.5) < 1e-12) // -(1/2 log 1/2 + 2 * 1/4 log 1/4)
  }

  test("registrations are per-session: a fresh child session needs its own register") {
    // newSession() does NOT inherit runtime registrations — registering
    // there must work independently and not disturb the parent.
    val s2 = spark.newSession()
    intercept[Throwable] {
      s2.sql("SELECT dot_long(array(1L), array(1L))").head()
    }
    GraftExtensions.register(s2)
    assert(s2.sql("SELECT dot_long(array(2L), array(3L)) AS d").head().getLong(0) == 6L)
  }
}
