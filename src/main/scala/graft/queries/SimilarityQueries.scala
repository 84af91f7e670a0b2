package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (64-d float vectors) — north-star similarity-search operators.
  *
  * Two plans for the same semantics:
  *  - brute-force: query-set × corpus cross product, exact cosine, per-query
  *    top-k. Correct baseline; at scale the query set is broadcast so the
  *    corpus scan is one pass with no shuffle before the top-k.
  *  - SRP-LSH: deterministic sign-random-projection buckets; candidates are
  *    bucket-mates only. The 100 TB path — bucket key is computed in the
  *    projection, the join is equi on the bucket id, and recall/cost trades
  *    off via nBits (multi-probe = also join on neighbor buckets).
  *
  * Cosines use [[graft.functions.TextFns.scaledVec]] exact-integer dots, so
  * both queries are DuckDB-oracle-checked bit-for-bit.
  */
object SimilarityQueries {
  import QuerySpec._

  val TopK = 10
  val NQueries = 5L
  val SrpBits = 6
  val Dim = 64

  // Squared norms precomputed once per vector: each scored pair costs one
  // dot product, and the identical integers reach the same sqrt/divide.
  private val svSql =
    s"SELECT vec_id, label, v, ${sqlDotInt("v", "v", Dim)} AS n2 FROM " +
      s"(SELECT vec_id, label, ${sqlScaledVec("embedding")} AS v FROM embeddings)"

  private def svSpark(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.Tables.embeddings(s, d)
      .select(col("vec_id"), scaledVec(col("embedding")).as("v"))
      .withColumn("n2", dotInt(col("v"), col("v")))

  val all: Seq[QuerySpec] = Seq(

    // Brute-force exact top-k: the correctness anchor. row_number over
    // (query, cos desc, vec_id) — deterministic total order.
    checked("ann_cosine_topk",
      s"""WITH sv AS ($svSql),
         |q AS (SELECT vec_id AS q_id, v AS qv, n2 AS qn2 FROM sv WHERE vec_id < $NQueries),
         |scored AS (
         |  SELECT q_id, vec_id, ${sqlDotInt("qv", "v", Dim)} / (sqrt(qn2) * sqrt(n2)) AS cos
         |  FROM q JOIN sv ON vec_id <> q_id),
         |ranked AS (SELECT q_id, vec_id, cos,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
         |  FROM scored)
         |SELECT q_id, rnk, vec_id, ${graft.functions.DetAgg.sqlR6("cos")} AS cos
         |FROM ranked WHERE rnk <= $TopK""".stripMargin) { (s, d) =>
      val sv = svSpark(s, d)
      val q = sv.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("n2").as("qn2"))
      val scored = broadcast(q).join(sv, col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          (dotInt(col("qv"), col("v")) / (sqrt(col("qn2")) * sqrt(col("n2")))).as("cos"))
      val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= TopK)
        .select(col("q_id"), col("rnk"), col("vec_id"), graft.functions.DetAgg.r6(col("cos")).as("cos"))
    },

    // SRP-LSH bucketed ANN: candidates = same-bucket vectors only.
    checked("ann_srp_lsh",
      s"""WITH sv AS ($svSql),
         |bk AS (SELECT vec_id, v, n2, ${sqlSrpBucket("v", SrpBits, Dim)} AS bucket FROM sv),
         |q AS (SELECT vec_id AS q_id, v AS qv, n2 AS qn2, bucket FROM bk WHERE vec_id < 50),
         |scored AS (
         |  SELECT q_id, bk.vec_id AS vec_id,
         |    ${sqlDotInt("qv", "bk.v", Dim)} / (sqrt(qn2) * sqrt(bk.n2)) AS cos
         |  FROM q JOIN bk ON q.bucket = bk.bucket AND bk.vec_id <> q.q_id),
         |ranked AS (SELECT q_id, vec_id, cos,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
         |  FROM scored)
         |SELECT q_id, rnk, vec_id, ${graft.functions.DetAgg.sqlR6("cos")} AS cos
         |FROM ranked WHERE rnk <= 5""".stripMargin) { (s, d) =>
      val sv = svSpark(s, d)
      val bk = sv.withColumn("bucket", srpBucket(col("v"), SrpBits, Dim))
      val q = bk.filter(col("vec_id") < 50)
        .select(col("vec_id").as("q_id"), col("v").as("qv"),
          col("n2").as("qn2"), col("bucket"))
      val scored = broadcast(q)
        .join(bk.select(col("vec_id"), col("v"), col("n2"), col("bucket").as("b2")),
          col("bucket") === col("b2") && col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          (dotInt(col("qv"), col("v")) / (sqrt(col("qn2")) * sqrt(col("n2")))).as("cos"))
      val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("q_id"), col("rnk"), col("vec_id"), graft.functions.DetAgg.r6(col("cos")).as("cos"))
    })
}
