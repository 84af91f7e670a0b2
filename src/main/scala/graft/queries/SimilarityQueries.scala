package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns._
import graft.functions.expr.DotLong

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
  * `ann_recall` closes the loop: the approximate operators' oracles prove
  * the ALGORITHM is computed exactly, not that it finds good neighbors —
  * recall@k against the brute-force truth is what documents the quality of
  * the 6-bit / nProbe=2 operating points (and it is itself deterministic,
  * hence oracle-checked).
  *
  * Cosines use [[graft.functions.TextFns.scaledVec]] exact-integer dots, so
  * every query here is DuckDB-oracle-checked bit-for-bit.
  */
object SimilarityQueries {
  import QuerySpec._

  val TopK = 10
  val NQueries = 5L
  val SrpBits = 6
  val Dim = 64
  /** IVF coarse quantizer: nList sampled centroids, nProbe probed lists. */
  val IvfLists = 8
  val IvfProbe = 2
  val IvfCentroidBase = 10L
  /** Query set for the approximate operators and the recall measurement. */
  val RecallQueries = 50L

  /** k-means training: cluster count, fixed Lloyd iterations, and the
    * fixed-id init sample base (disjoint from the IVF centroid range so
    * the two quantizers stay independent). */
  val KmK = 4
  val KmIters = 3
  val KmInitBase = 20L

  /** Product quantization: M subspaces × Sub dims each (M·Sub = Dim), Ks
    * codewords per subspace, sampled from a fixed vec_id range disjoint
    * from the IVF/k-means init ranges. Code size = M·log2(Ks) bits per
    * vector. */
  val PqM = 4
  val PqSub = Dim / PqM
  val PqKs = 8
  val PqBase = 30L

  /** MMR re-ranking: query vector id, retrieved-window size, selection
    * depth, and the relevance/diversity weights as SEPARATE literals
    * (never derive one from the other: `1 - 0.7` is 0.30000000000000004
    * in IEEE — both engines must see the same spelled constant). */
  val MmrQueryId = 0L
  val MmrCand = 32
  val MmrK = 8
  val MmrLam = 0.7
  val MmrLamInv = 0.3

  // Squared norms precomputed once per vector: each scored pair costs one
  // dot product, and the identical integers reach the same sqrt/divide.
  private val svSql =
    s"SELECT vec_id, label, v, ${sqlDotInt("v", "v", Dim)} AS n2 FROM " +
      s"(SELECT vec_id, label, ${sqlScaledVec("embedding")} AS v FROM embeddings)"

  // Staged once per query (QuerySpec.staged): every ANN plan consumes sv
  // from 2-3 branches (query set, corpus side, centroid sample), and the
  // scaled-vector projection is a higher-order lambda (interpreted, no
  // codegen) — without staging it re-runs per branch.
  private def svSpark(s: SparkSession, d: String) =
    QuerySpec.staged(graft.Tables.embeddings(s, d)
      .select(col("vec_id"), scaledVec(col("embedding")).as("v"))
      .withColumn("n2", dotInt(col("v"), col("v"))))

  private def exactCos =
    (dotInt(col("qv"), col("v")) / (sqrt(col("qn2")) * sqrt(col("n2")))).as("cos")

  /** Brute-force scored set: every (query, corpus) pair, exact cosine.
    * Query side broadcast — the corpus scan is one shuffle-free pass. */
  private def scoredBrute(sv: DataFrame, maxQ: Long): DataFrame = {
    val q = sv.filter(col("vec_id") < maxQ)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("n2").as("qn2"))
    broadcast(q).join(sv, col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), exactCos)
  }

  /** SRP single-probe scored set: candidates are same-bucket vectors. */
  private def scoredSrp(bk: DataFrame): DataFrame = {
    val q = bk.filter(col("vec_id") < RecallQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("n2").as("qn2"), col("bucket"))
    broadcast(q)
      .join(bk.select(col("vec_id"), col("v"), col("n2"), col("bucket").as("b2")),
        col("bucket") === col("b2") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), exactCos)
  }

  /** Multi-probe SRP scored set: each query probes its own bucket AND every
    * bucket at Hamming distance 1 (flip each of the nBits sign bits) — the
    * standard recall/cost knob for sign-random-projection indexes. Probe
    * keys are generated in the projection (no shuffle), the candidate join
    * is equi on bucket id, candidates dedup on (query, vector) BEFORE the
    * exact re-rank so each pair is scored once no matter how many probes
    * found it. */
  private def scoredSrpMultiprobe(bk: DataFrame): DataFrame = {
    val probes = array((0 to SrpBits).map {
      case 0 => col("bucket")
      case i => col("bucket").bitwiseXOR(lit(1L << (i - 1)))
    }: _*)
    val qp = bk.filter(col("vec_id") < RecallQueries)
      .select(col("vec_id").as("q_id"), explode(probes).as("probe"))
    val cand = broadcast(qp)
      .join(bk.select(col("vec_id"), col("bucket").as("b2")),
        col("probe") === col("b2") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"))
      .distinct()
    cand
      .join(bk.select(col("vec_id").as("q_id"), col("v").as("qv"), col("n2").as("qn2")), "q_id")
      .join(bk.select(col("vec_id"), col("v"), col("n2")), "vec_id")
      .select(col("q_id"), col("vec_id"), exactCos)
  }

  /** IVF scored set: coarse quantizer = IvfLists sampled centroids (fixed
    * vec_ids — the standard init for an IVF index); every vector is
    * assigned to its nearest centroid by exact squared L2 distance in
    * scaled-integer space (‖x−c‖² = n2 − 2·x·c + cn2, all integer-valued →
    * bit-exact, ties by centroid id); queries probe their IvfProbe nearest
    * lists and candidates get the exact cosine. The 100 TB shape: the
    * quantizer is DRIVER state (nList vectors — exactly what a production
    * IVF index trains centrally and ships to every worker), inlined as
    * literals so both the corpus assignment (argmin over the distance
    * array) and the query probe (sorted (dist, c_id) structs, first nProbe)
    * are pure codegen'd projections — zero shuffle until the candidate
    * equi-join on list id, which touches nProbe/nList of the corpus. */
  /** IVF quantizer state as plan fragments: (corpus assignment DataFrame,
    * per-row probe array). Shared by `scoredIvf` (one-shot) and
    * `ann_ivf_incremental` (persisted store) so both routes freeze the
    * SAME centroids — the production invariant that makes an incremental
    * index append-consistent. */
  /** Frozen-quantizer plan fragments, applicable to ANY relation carrying
    * (v, n2): `cId` assigns a row to its list, `probe` is the sorted
    * (dist, c_id) probe array. Both are pure literal-centroid expressions,
    * so batch and streaming routes assign identically by construction. */
  private final case class IvfQuantizer(cId: org.apache.spark.sql.Column,
      probe: org.apache.spark.sql.Column)

  private def ivfQuantizer(sv: DataFrame): IvfQuantizer = {
    // Quantizer to the driver: IvfLists rows, bounded by construction —
    // the one collect a real IVF index also does (its centroids are
    // trained centrally and broadcast as literals/closure state).
    val cent = sv
      .filter(col("vec_id") >= IvfCentroidBase &&
        col("vec_id") < IvfCentroidBase + IvfLists)
      .select((col("vec_id") - IvfCentroidBase).as("c_id"),
        col("v").as("cv"), col("n2").as("cn2"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getDouble(2)))
      .sortBy(_._1)
    // Per-centroid exact squared-L2 distance columns, ordered by c_id.
    val dists = cent.map { case (cid, cv, cn2) =>
      (cid, col("n2") - lit(2) * dotInt(array(cv.map(lit): _*), col("v")) + lit(cn2))
    }
    val dArr = array(dists.map(_._2): _*)
    // Corpus assignment: argmin of the distance array; array_position
    // returns the FIRST index holding the min, i.e. ties break to the
    // lowest c_id — the oracle's ORDER BY dist, c_id with rn = 1. The
    // position indexes into the REAL c_id list (not position-1): the two
    // coincide only while the centroid vec_id range has no gaps, and the
    // probe side carries real c_ids, so a sparse corpus would otherwise
    // silently lose lists in the candidate equi-join.
    val cidArr = array(dists.map(d => lit(d._1)): _*)
    // Query probes: lexicographic sort of (dist, c_id) structs = the
    // oracle's ORDER BY dist, c_id; callers slice the first IvfProbe.
    val probeArr = sort_array(array(dists.map { case (cid, dc) =>
      struct(dc.as("d"), lit(cid).as("c_id"))
    }: _*))
    IvfQuantizer(
      element_at(cidArr, array_position(dArr, array_min(dArr)).cast("int")),
      probeArr)
  }

  private def ivfAssignProbe(sv: DataFrame): (DataFrame,
      org.apache.spark.sql.Column) = {
    val q = ivfQuantizer(sv)
    (sv.select(col("vec_id"), col("v"), col("n2"), q.cId.as("c_id")), q.probe)
  }

  /** Probe fan-out: queries exploded to their first IvfProbe lists. */
  private def ivfQueryProbes(sv: DataFrame,
      probeArr: org.apache.spark.sql.Column): DataFrame =
    sv.filter(col("vec_id") < RecallQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("n2").as("qn2"),
        explode(slice(probeArr, 1, IvfProbe)).as("p"))
      .select(col("q_id"), col("qv"), col("qn2"), col("p.c_id").as("c_id"))

  /** Answer the standard top-5 THROUGH a list-partitioned parquet index
    * store (shared tail of ann_ivf_incremental and stream_ivf_ingest).
    * The partition column round-trips as INT directory values; restoring
    * the quantizer's LONG c_id keeps the probe equi-join cast-free. */
  private def ivfStoreTopK(s: SparkSession, sv: DataFrame,
      probeArr: org.apache.spark.sql.Column, store: String): DataFrame = {
    val idx = s.read.parquet(store)
      .select(col("vec_id"), col("v"), col("n2"),
        col("c_id").cast("long").as("c2"))
    val scored = broadcast(ivfQueryProbes(sv, probeArr))
      .join(idx, col("c_id") === col("c2") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), exactCos)
    topK(scored, 5)
  }

  private def scoredIvf(sv: DataFrame): DataFrame = {
    val (asg, probeArr) = ivfAssignProbe(sv)
    broadcast(ivfQueryProbes(sv, probeArr))
      .join(asg.select(col("vec_id"), col("v"), col("n2"), col("c_id").as("c2")),
        col("c_id") === col("c2") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), exactCos)
  }

  /** Final per-query top-k over scored candidates via the bounded-heap
    * [[graft.functions.expr.CosTopK]] aggregate. The previous
    * `row_number().over(Window.partitionBy("q_id"))` shape shuffled every
    * scored row to one reducer per query before discarding all but k; the
    * aggregate reduces map-side (ObjectHashAggregate partial), so only
    * O(queries × k) pairs cross the exchange — for brute-force ANN that is
    * the difference between shuffling the corpus and shuffling the answer.
    * Same (cos DESC, vec_id ASC) total order as the oracle's window. */
  /** Shared kNN decision rule (ml_knn_classify + ml_confusion_matrix):
    * 5-NN majority vote, ties to the lowest label. The SQL prefix ends at
    * the `best` CTE (no trailing comma); the Spark helper returns one row
    * per query with (q_id, true_label, predicted, votes). */
  private val knnVotesSql =
    s"""WITH sv AS ($svSql),
       |q AS (SELECT vec_id AS q_id, label AS true_label, v AS qv, n2 AS qn2
       |  FROM sv WHERE vec_id < $RecallQueries),
       |scored AS (
       |  SELECT q_id, true_label, vec_id, label,
       |    ${sqlDotInt("qv", "v", Dim)} / (sqrt(qn2) * sqrt(n2)) AS cos
       |  FROM q JOIN sv ON vec_id <> q_id),
       |ranked AS (SELECT q_id, true_label, label,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id)
       |      AS rnk
       |  FROM scored),
       |votes AS (SELECT q_id, true_label, label,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM ranked WHERE rnk <= 5 GROUP BY 1, 2, 3),
       |best AS (SELECT q_id, true_label, label, c,
       |    max(c) OVER (PARTITION BY q_id) AS mx FROM votes)""".stripMargin

  private def knnPredictions(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sv = svSpark(s, d)
    val nn = topK(scoredBrute(sv, RecallQueries), 5)
    val labels = graft.Tables.embeddings(s, d).select(col("vec_id"), col("label"))
    val votes = nn.join(broadcast(labels), "vec_id")
      .groupBy("q_id", "label").agg(count(lit(1)).as("c"))
      .withColumn("mx", max(col("c")).over(Window.partitionBy("q_id")))
      .filter(col("c") === col("mx"))
      .groupBy("q_id")
      .agg(min(col("label")).as("predicted"), max(col("mx")).as("votes"))
    votes.join(broadcast(labels.select(col("vec_id").as("q_id"),
      col("label").as("true_label"))), "q_id")
  }

  private def topK(scored: DataFrame, k: Int) =
    scored.groupBy("q_id")
      .agg(graft.functions.expr.CosTopK.topk(col("cos"), col("vec_id"), k).as("tk"))
      .select(col("q_id"), explode(col("tk")).as("t"))
      .select(col("q_id"), col("t.rnk").as("rnk"), col("t.vec_id").as("vec_id"),
        graft.functions.DetAgg.r6(col("t.cos")).as("cos"))

  // ---- shared DuckDB fragments -----------------------------------------

  private val bkSql =
    s"SELECT vec_id, v, n2, ${sqlSrpBucket("v", SrpBits, Dim)} AS bucket FROM sv"

  /** `ranked AS (...) SELECT … WHERE rnk <= k` tail over a scored CTE. */
  private def rankedTailSql(k: Int): String =
    s"""ranked AS (SELECT q_id, vec_id, cos,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
       |  FROM scored)
       |SELECT q_id, rnk, vec_id, ${graft.functions.DetAgg.sqlR6("cos")} AS cos
       |FROM ranked WHERE rnk <= $k""".stripMargin

  private val srpScoredSql =
    s"""q AS (SELECT vec_id AS q_id, v AS qv, n2 AS qn2, bucket FROM bk WHERE vec_id < $RecallQueries),
       |scored AS (
       |  SELECT q_id, bk.vec_id AS vec_id,
       |    ${sqlDotInt("qv", "bk.v", Dim)} / (sqrt(qn2) * sqrt(bk.n2)) AS cos
       |  FROM q JOIN bk ON q.bucket = bk.bucket AND bk.vec_id <> q.q_id)""".stripMargin

  private val mpScoredSql =
    s"""qp AS (SELECT vec_id AS q_id, unnest(list_transform(range(0, ${SrpBits + 1}),
       |    i -> CASE WHEN i = 0 THEN bucket
       |         ELSE xor(bucket, CAST(1 AS BIGINT) << (i - 1)) END)) AS probe
       |  FROM bk WHERE vec_id < $RecallQueries),
       |cand AS (SELECT DISTINCT q_id, bk.vec_id AS vec_id
       |  FROM qp JOIN bk ON qp.probe = bk.bucket AND bk.vec_id <> qp.q_id),
       |scored AS (
       |  SELECT cand.q_id, cand.vec_id,
       |    ${sqlDotInt("qb.v", "cb.v", Dim)} / (sqrt(qb.n2) * sqrt(cb.n2)) AS cos
       |  FROM cand JOIN bk qb ON cand.q_id = qb.vec_id
       |            JOIN bk cb ON cand.vec_id = cb.vec_id)""".stripMargin

  private val ivfScoredSql = {
    val dist = s"(n2 - 2 * ${sqlDotInt("v", "cv", Dim)} + cn2)"
    val qdist = s"(qn2 - 2 * ${sqlDotInt("qv", "cv", Dim)} + cn2)"
    s"""cent AS (SELECT vec_id - $IvfCentroidBase AS c_id, v AS cv, n2 AS cn2
       |  FROM sv WHERE vec_id >= $IvfCentroidBase AND vec_id < ${IvfCentroidBase + IvfLists}),
       |asg AS (SELECT vec_id, v, n2, c_id FROM (
       |  SELECT sv.vec_id, sv.v, sv.n2, cent.c_id,
       |    row_number() OVER (PARTITION BY sv.vec_id ORDER BY $dist, c_id) AS rn
       |  FROM sv CROSS JOIN cent) WHERE rn = 1),
       |q AS (SELECT q_id, qv, qn2, c_id FROM (
       |  SELECT sv.vec_id AS q_id, sv.v AS qv, sv.n2 AS qn2, cent.c_id,
       |    row_number() OVER (PARTITION BY sv.vec_id ORDER BY $qdist, c_id) AS rn
       |  FROM sv CROSS JOIN cent WHERE sv.vec_id < $RecallQueries) WHERE rn <= $IvfProbe),
       |scored AS (
       |  SELECT q_id, asg.vec_id AS vec_id,
       |    ${sqlDotInt("qv", "asg.v", Dim)} / (sqrt(qn2) * sqrt(asg.n2)) AS cos
       |  FROM q JOIN asg ON q.c_id = asg.c_id AND asg.vec_id <> q.q_id)""".stripMargin
  }

  /** The IVF-PQ CTE chain (coarse lists -> residual PQ codes -> per-list
    * query LUTs -> ADC over probed lists), shared by ann_ivfpq, its
    * recall measurement, and the knob ladder. Expects an `sv` CTE in
    * scope; ends at the `adc` relation (q_id, vec_id, adc). The
    * (nProbe, ks) operating point is a parameter so the ladder can state
    * three points from ONE template — any chain edit moves every point
    * and its contracts together. */
  private val ivfpqChainSql = ivfpqChainSqlFor(IvfProbe, PqKs)

  private def ivfpqChainSqlFor(nProbe: Int, ks: Int): String = {
    val dist = s"(n2 - 2 * ${sqlDotInt("v", "cv", Dim)} + cn2)"
    s"""ms AS (SELECT range AS m FROM range(0, $PqM)),
       |cent AS (SELECT vec_id - $IvfCentroidBase AS c_id, v AS cv, n2 AS cn2
       |  FROM sv WHERE vec_id >= $IvfCentroidBase AND vec_id < ${IvfCentroidBase + IvfLists}),
       |asg AS (SELECT vec_id, v, n2, c_id FROM (
       |  SELECT sv.vec_id, sv.v, sv.n2, cent.c_id,
       |    row_number() OVER (PARTITION BY sv.vec_id ORDER BY $dist, c_id) AS rn
       |  FROM sv CROSS JOIN cent) WHERE rn = 1),
       |res AS (SELECT a.vec_id, a.c_id,
       |    list_transform(range(1, ${Dim + 1}), i -> a.v[i] - cent.cv[i]) AS r
       |  FROM asg a JOIN cent ON a.c_id = cent.c_id),
       |cw AS (SELECT r.vec_id - $PqBase AS c, m.m,
       |    r.r[m.m * $PqSub + 1 : m.m * $PqSub + $PqSub] AS cv
       |  FROM res r CROSS JOIN ms m
       |  WHERE r.vec_id >= $PqBase AND r.vec_id < ${PqBase + ks}),
       |sub AS (SELECT vec_id, c_id, m.m,
       |    r[m.m * $PqSub + 1 : m.m * $PqSub + $PqSub] AS xv
       |  FROM res CROSS JOIN ms m),
       |dnc AS (SELECT s.vec_id, s.c_id, s.m, c.c,
       |    CAST(list_aggregate(list_transform(range(1, ${PqSub + 1}),
       |      i -> (s.xv[i] - c.cv[i]) * (s.xv[i] - c.cv[i])), 'sum')
       |      AS BIGINT) AS dd
       |  FROM sub s JOIN cw c ON s.m = c.m),
       |code AS (SELECT vec_id, c_id, m, c FROM (SELECT vec_id, c_id, m, c,
       |    row_number() OVER (PARTITION BY vec_id, m ORDER BY dd, c) AS rn
       |  FROM dnc) WHERE rn = 1),
       |qp AS (SELECT q_id, qv, c_id FROM (
       |  SELECT sv.vec_id AS q_id, sv.v AS qv, cent.c_id,
       |    row_number() OVER (PARTITION BY sv.vec_id ORDER BY $dist, c_id) AS rn
       |  FROM sv CROSS JOIN cent WHERE sv.vec_id < $RecallQueries)
       |  WHERE rn <= $nProbe),
       |qres AS (SELECT qp.q_id, qp.c_id,
       |    list_transform(range(1, ${Dim + 1}), i -> qp.qv[i] - cent.cv[i]) AS qr
       |  FROM qp JOIN cent ON qp.c_id = cent.c_id),
       |qsub AS (SELECT q_id, c_id, m.m,
       |    qr[m.m * $PqSub + 1 : m.m * $PqSub + $PqSub] AS xv
       |  FROM qres CROSS JOIN ms m),
       |qd AS (SELECT s.q_id, s.c_id, s.m, c.c,
       |    CAST(list_aggregate(list_transform(range(1, ${PqSub + 1}),
       |      i -> (s.xv[i] - c.cv[i]) * (s.xv[i] - c.cv[i])), 'sum')
       |      AS BIGINT) AS dd
       |  FROM qsub s JOIN cw c ON s.m = c.m),
       |adc AS (SELECT qd.q_id, x.vec_id, CAST(sum(qd.dd) AS BIGINT) AS adc
       |  FROM code x JOIN qd ON qd.c_id = x.c_id AND qd.m = x.m AND qd.c = x.c
       |  WHERE x.vec_id <> qd.q_id
       |  GROUP BY 1, 2)""".stripMargin
  }

  /** Shared IVF-PQ search: assignment + residual encode + per-list ADC,
    * ranked to the top-5 per query through the bounded heap. Centroids and
    * the residual codebook are bounded driver state inlined as literals.
    * Split in two so the knob ladder (`ann_ivfpq_ladder`) pays the staged
    * corpus pass ONCE: [[ivfpqParts]] holds everything independent of the
    * (nProbe, ks) operating point; [[scoredIvfpqTop5From]] applies one
    * operating point on top of it. */
  private final case class IvfpqParts(
      sv: DataFrame,
      dists: Array[(Long, Column)],
      cvMat: Column,
      asgR: DataFrame)

  private def ivfpqParts(s: SparkSession, d: String): IvfpqParts = {
      val sv = svSpark(s, d)
      val cent = sv
        .filter(col("vec_id") >= IvfCentroidBase &&
          col("vec_id") < IvfCentroidBase + IvfLists)
        .select((col("vec_id") - IvfCentroidBase).as("c_id"),
          col("v").as("cv"), col("n2").as("cn2"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toIndexedSeq, r.getDouble(2)))
        .sortBy(_._1)
      // both driver-side matrices below index POSITIONALLY, so enforce
      // the gap-free-ids contract instead of assuming it: a corpus
      // missing one seed id would otherwise silently shift every code
      // relative to the SQL oracle (which keys by actual vec_id).
      require(cent.length == IvfLists,
        s"IVF centroid seeds not gap-free: ${cent.length} != $IvfLists")
      val dists = cent.map { case (cid, cvv, cn2) =>
        (cid, col("n2") - lit(2) * dotInt(array(cvv.map(lit): _*), col("v")) + lit(cn2))
      }
      val dArr = array(dists.map(_._2): _*)
      val cidArr = array(dists.map(x => lit(x._1)): _*)
      // centroid matrix indexed by c_id position (ids are gap-free by
      // construction — the scoredIvf contract)
      val cvMat = array(cent.map(c => array(c._2.map(lit): _*)): _*)
      // ONE staged corpus pass: assignment + exact integer residual
      val asgR = QuerySpec.staged(sv
        .select(col("vec_id"), col("v"), col("n2"),
          element_at(cidArr, array_position(dArr, array_min(dArr)).cast("int"))
            .as("c_id"))
        .withColumn("r", zip_with(col("v"),
          element_at(cvMat, (col("c_id") + 1).cast("int")), (a, b) => a - b)))
      IvfpqParts(sv, dists, cvMat, asgR)
  }

  private def scoredIvfpqTop5(s: SparkSession, d: String): DataFrame =
    scoredIvfpqTop5From(ivfpqParts(s, d), IvfProbe, PqKs)

  /** ann_ivfpq_ladder operating points: (label, nProbe, ks). The ladder
    * spans both quantizer knobs from the production point (2, PqKs):
    * halving the codebook (coarser residual quantization) and halving
    * the probes (smaller candidate pool). */
  val IvfpqOps: Seq[(String, Int, Int)] = Seq(
    ("p1_ks8", 1, PqKs), ("p2_ks4", 2, PqKs / 2), ("p2_ks8", 2, PqKs))

  /** Per-(op, query) hit counts of each IVFPQ operating point against the
    * brute-force truth — ONE staged corpus pass feeds all points. Returns
    * (per-query frame, per-op top-5 selections) so the ladder query can
    * also state its set-divergence contract from the same execution. */
  private def ivfpqLadderHits(s: SparkSession,
                              d: String): (DataFrame, DataFrame) = {
    val parts = ivfpqParts(s, d)
    val truth = topK(scoredBrute(parts.sv, RecallQueries), 5)
      .select(col("q_id"), col("vec_id"))
    val appx = QuerySpec.staged(IvfpqOps.map { case (lbl, np, ks) =>
      scoredIvfpqTop5From(parts, np, ks)
        .select(lit(lbl).as("op"), col("q_id"), col("vec_id"))
    }.reduce(_ unionAll _))
    val hits = appx.join(truth, Seq("q_id", "vec_id"))
      .groupBy("op", "q_id").agg(count(lit(1)).as("n_hits"))
    val opsDf = parts.sv.sparkSession.range(1)
      .select(explode(array(IvfpqOps.map(o => lit(o._1)): _*)).as("op"))
    val out = parts.sv.filter(col("vec_id") < RecallQueries)
      .select(col("vec_id").as("q_id"))
      .crossJoin(broadcast(opsDf))
      .join(hits, Seq("op", "q_id"), "left")
      .select(col("op"), col("q_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) / 5.0).as("recall_at_5"))
    (out, appx)
  }


  private def scoredIvfpqTop5From(parts: IvfpqParts,
                                  nProbe: Int, ks: Int): DataFrame = {
      val IvfpqParts(sv, dists, cvMat, asgR) = parts
      // residual codebook: bounded driver state (ks sample residuals)
      val cwRows = asgR
        .filter(col("vec_id") >= PqBase && col("vec_id") < PqBase + ks)
        .select(col("vec_id"), col("r")).collect()
        .sortBy(_.getLong(0))
        .map(_.getSeq[Long](1).toIndexedSeq)
      require(cwRows.length == ks,
        s"PQ codebook seeds not gap-free: ${cwRows.length} != $ks")
      def cvw(c: Int, m: Int): IndexedSeq[Long] =
        cwRows(c).slice(m * PqSub, (m + 1) * PqSub)
      def pqDists(src: Column)(m: Int): IndexedSeq[Column] = {
        val sub = slice(src, m * PqSub + 1, PqSub)
        val xn2 = DotLong(sub, sub)
        (0 until ks).map { c =>
          val cvm = cvw(c, m)
          xn2 - lit(2L) * DotLong(sub, array(cvm.map(lit): _*)) +
            lit(cvm.map(x => x * x).sum)
        }
      }
      // corpus encode: argmin per subspace, first-min = lowest code
      val codeCols = (0 until PqM).map { m =>
        val da = array(pqDists(col("r"))(m): _*)
        (array_position(da, array_min(da)) - 1L).cast("int").as(s"code$m")
      }
      val enc = asgR.select(Seq(col("vec_id"), col("c_id")) ++ codeCols: _*)
      // query probes: nearest IvfProbe lists, fresh residual LUT per list
      val probeArr = sort_array(array(dists.map { case (cid, dc) =>
        struct(dc.as("d"), lit(cid).as("c_id"))
      }: _*))
      val qp = sv.filter(col("vec_id") < RecallQueries)
        .select(col("vec_id").as("q_id"), col("v").as("qv"),
          explode(slice(probeArr, 1, nProbe)).as("p"))
        .select(col("q_id"), col("qv"), col("p.c_id").as("c_id"))
        .withColumn("qr", zip_with(col("qv"),
          element_at(cvMat, (col("c_id") + 1).cast("int")), (a, b) => a - b))
      val q = qp.select(Seq(col("q_id"), col("c_id")) ++
        (0 until PqM).map(m => array(pqDists(col("qr"))(m): _*).as(s"lut$m")): _*)
      val adcCol = (0 until PqM).map(m =>
        element_at(col(s"lut$m"), col(s"code$m") + 1)).reduce(_ + _)
      // candidates = probed lists only (c_id equi-join), never the corpus
      val scored = broadcast(q).join(enc, Seq("c_id"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), (-adcCol).cast("double").as("cos"))
      scored.groupBy("q_id")
        .agg(graft.functions.expr.CosTopK.topk(col("cos"), col("vec_id"), 5).as("tk"))
        .select(col("q_id"), explode(col("tk")).as("t"))
        .select(col("q_id"), col("t.rnk").as("rnk"), col("t.vec_id").as("vec_id"),
          (-col("t.cos")).cast("long").as("adc"))
  }

  val all: Seq[QuerySpec] = Seq(

    // Brute-force exact top-k: the correctness anchor. row_number over
    // (query, cos desc, vec_id) — deterministic total order.
    checked("ann_cosine_topk",
      s"""WITH sv AS ($svSql),
         |q AS (SELECT vec_id AS q_id, v AS qv, n2 AS qn2 FROM sv WHERE vec_id < $NQueries),
         |scored AS (
         |  SELECT q_id, vec_id, ${sqlDotInt("qv", "v", Dim)} / (sqrt(qn2) * sqrt(n2)) AS cos
         |  FROM q JOIN sv ON vec_id <> q_id),
         |${rankedTailSql(TopK)}""".stripMargin) { (s, d) =>
      topK(scoredBrute(svSpark(s, d), NQueries), TopK)
    },

    // The SQL-PARSER entry point (round-9 verdict #8): the identical
    // brute-force top-k, but stated entirely through `spark.sql` with
    // the engine's natives called BY NAME from SQL text —
    // [[graft.GraftExtensions]] registers `dot_long` (codegen'd scalar)
    // and `cos_top_k` (bounded-heap aggregate, analyzer-wrapped from the
    // bare AggregateFunction) into the session function registry, and
    // this query proves that route end-to-end against the same DuckDB
    // oracle as ann_cosine_topk: parser → registry builder → the same
    // physical plan family (partial_cos_top_k before the exchange) →
    // the same bits. Same literals, same IEEE tree, same r6 grid.
    checked("sql_ann_topk",
      s"""WITH sv AS ($svSql),
         |q AS (SELECT vec_id AS q_id, v AS qv, n2 AS qn2 FROM sv WHERE vec_id < $NQueries),
         |scored AS (
         |  SELECT q_id, vec_id, ${sqlDotInt("qv", "v", Dim)} / (sqrt(qn2) * sqrt(n2)) AS cos
         |  FROM q JOIN sv ON vec_id <> q_id),
         |${rankedTailSql(TopK)}""".stripMargin) { (s, d) =>
      graft.GraftExtensions.register(s)
      Tables.embeddings(s, d).createOrReplaceTempView("graft_sql_embeddings")
      s.sql(
        s"""WITH sv0 AS (
           |  SELECT vec_id,
           |    transform(embedding,
           |      x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS v
           |  FROM graft_sql_embeddings),
           |sv AS (SELECT vec_id, v,
           |    CAST(dot_long(v, v) AS DOUBLE) AS n2 FROM sv0),
           |q AS (SELECT vec_id AS q_id, v AS qv, n2 AS qn2 FROM sv
           |  WHERE vec_id < $NQueries),
           |scored AS (
           |  SELECT q_id, sv.vec_id,
           |    CAST(dot_long(qv, sv.v) AS DOUBLE) / (sqrt(qn2) * sqrt(n2)) AS cos
           |  FROM q JOIN sv ON sv.vec_id <> q_id),
           |tk AS (SELECT q_id, cos_top_k(cos, vec_id, $TopK) AS tk
           |  FROM scored GROUP BY q_id)
           |SELECT q_id, rnk, vec_id,
           |  floor(cos * 1e6 + 0.5) / 1e6 AS cos
           |FROM tk LATERAL VIEW inline(tk) t""".stripMargin)
    },

    // CALIBRATION of the kNN vote — the reliability-diagram regime that
    // closes the eval family (AUC ranks, lift targets, NDCG orders,
    // confusion counts; calibration asks whether CONFIDENCE means what
    // it says): vote share = votes/5 is the classifier's confidence,
    // and each confidence bin reports its empirical accuracy beside the
    // confidence itself — a calibrated model's bins sit on the
    // diagonal. Same shared kNN decision rule; exact-integer ratios
    // with one IEEE division each over the ≤5-row bin frame.
    checked("ml_calibration_bins",
      s"""$knnVotesSql,
         |pred AS (SELECT q_id, true_label, CAST(min(label) AS INT)
         |    AS predicted, CAST(max(mx) AS BIGINT) AS votes
         |  FROM best WHERE c = mx GROUP BY q_id, true_label)
         |SELECT votes, CAST(count(*) AS BIGINT) AS n,
         |  CAST(count(*) FILTER (WHERE predicted = true_label) AS BIGINT)
         |    AS n_correct,
         |  ${graft.functions.DetAgg.sqlR6(
            "CAST(votes AS DOUBLE) / 5.0")} AS confidence,
         |  ${graft.functions.DetAgg.sqlR6(
            "CAST(count(*) FILTER (WHERE predicted = true_label) AS DOUBLE)" +
              " / CAST(count(*) AS DOUBLE)")} AS accuracy
         |FROM pred GROUP BY votes""".stripMargin) { (s, d) =>
      knnPredictions(s, d)
        .groupBy("votes")
        .agg(count(lit(1)).as("n"),
          sum(when(col("predicted") === col("true_label"), 1L).otherwise(0L))
            .as("n_correct"))
        .select(col("votes"), col("n"), col("n_correct"),
          graft.functions.DetAgg.r6(col("votes").cast("double") / 5.0)
            .as("confidence"),
          graft.functions.DetAgg.r6(col("n_correct").cast("double") /
            col("n").cast("double")).as("accuracy"))
    },

    // FAIRNESS metrics over the kNN classifier — the governance pass a
    // production model ships with: for a protected attribute (the
    // deterministic vec_id parity split), per-group selection rate for
    // a target class (demographic parity), and per-group TPR/FPR on
    // that class (equalized odds). All counts exact BIGINTs from the
    // shared decision rule; each rate is one IEEE division, and the
    // parity/odds GAPS are emitted so a reviewer reads the finding, not
    // just the inputs. Target class = label 7 (present in both groups
    // at every SF).
    checked("ml_fairness_metrics",
      s"""$knnVotesSql,
         |pred AS (SELECT q_id, true_label, CAST(min(label) AS INT)
         |    AS predicted FROM best WHERE c = mx GROUP BY q_id, true_label),
         |g AS (SELECT q_id % 2 AS grp, true_label, predicted FROM pred),
         |m AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
         |    CAST(count(*) FILTER (WHERE predicted = 7) AS BIGINT) AS sel,
         |    CAST(count(*) FILTER (WHERE true_label = 7 AND predicted = 7)
         |      AS BIGINT) AS tp,
         |    CAST(count(*) FILTER (WHERE true_label = 7) AS BIGINT) AS pos,
         |    CAST(count(*) FILTER (WHERE true_label <> 7 AND predicted = 7)
         |      AS BIGINT) AS fp,
         |    CAST(count(*) FILTER (WHERE true_label <> 7) AS BIGINT) AS neg
         |  FROM g GROUP BY grp)
         |SELECT grp, n, sel, tp, pos, fp, neg,
         |  ${graft.functions.DetAgg.sqlR6(
            "CAST(sel AS DOUBLE) / CAST(n AS DOUBLE)")} AS selection_rate,
         |  CASE WHEN pos = 0 THEN 0.0 ELSE ${graft.functions.DetAgg.sqlR6(
            "CAST(tp AS DOUBLE) / CAST(pos AS DOUBLE)")} END AS tpr,
         |  CASE WHEN neg = 0 THEN 0.0 ELSE ${graft.functions.DetAgg.sqlR6(
            "CAST(fp AS DOUBLE) / CAST(neg AS DOUBLE)")} END AS fpr
         |FROM m""".stripMargin) { (s, d) =>
      val m = knnPredictions(s, d)
        .select(expr("q_id % 2").as("grp"), col("true_label"),
          col("predicted"))
        .groupBy("grp")
        .agg(count(lit(1)).as("n"),
          sum(when(col("predicted") === 7, 1L).otherwise(0L)).as("sel"),
          sum(when(col("true_label") === 7 && col("predicted") === 7, 1L)
            .otherwise(0L)).as("tp"),
          sum(when(col("true_label") === 7, 1L).otherwise(0L)).as("pos"),
          sum(when(col("true_label") =!= 7 && col("predicted") === 7, 1L)
            .otherwise(0L)).as("fp"),
          sum(when(col("true_label") =!= 7, 1L).otherwise(0L)).as("neg"))
      def safe(num: org.apache.spark.sql.Column,
               den: org.apache.spark.sql.Column) =
        when(den === 0, lit(0.0)).otherwise(
          graft.functions.DetAgg.r6(num.cast("double") / den.cast("double")))
      m.select(col("grp"), col("n"), col("sel"), col("tp"), col("pos"),
        col("fp"), col("neg"),
        graft.functions.DetAgg.r6(col("sel").cast("double") /
          col("n").cast("double")).as("selection_rate"),
        safe(col("tp"), col("pos")).as("tpr"),
        safe(col("fp"), col("neg")).as("fpr"))
    },

    // INT8 per-vector quantization — the serving-side compression next
    // to ann_pq's codebook path (8× smaller embeddings with a per-vector
    // max-abs scale, the standard symmetric int8 scheme): codes are
    // round-half-up of v·127/scale (one fixed IEEE tree per component —
    // deterministic; |code| ≤ 127 by construction and MEASURED), and the
    // reconstruction L2 error is quantized per component before the sum
    // so it's an exact integer, with the analytic bound
    // 64·(scale/254)² (+64 quantization slack) asserted as a measured
    // boolean. Pure projection — zero shuffles at any scale.
    checked("ml_embedding_int8", {
      import graft.functions.TextFns.sqlScaledVec
      val code = "CAST(floor(x * 127.0 / scale + 0.5) AS BIGINT)"
      s"""WITH sv0 AS (SELECT vec_id, ${sqlScaledVec("embedding")} AS v
         |  FROM embeddings),
         |sv AS (SELECT vec_id, v,
         |    greatest(list_max(list_transform(v, x -> abs(x))), 1) AS scale
         |  FROM sv0),
         |q AS (SELECT vec_id, scale,
         |    list_max(list_transform(v, x -> abs($code))) AS max_code,
         |    CAST(list_aggregate(list_transform(v, x -> CAST(floor(
         |      (x - ($code) * scale / 127.0) *
         |      (x - ($code) * scale / 127.0) + 0.5) AS BIGINT)), 'sum')
         |      AS BIGINT) AS l2_err_q
         |  FROM sv)
         |SELECT vec_id, CAST(scale AS BIGINT) AS scale,
         |  CAST(max_code AS BIGINT) AS max_code,
         |  l2_err_q,
         |  max_code <= 127 AS within_range,
         |  l2_err_q <= CAST(floor(64.0 * (scale / 254.0) * (scale / 254.0))
         |    AS BIGINT) + 64 AS err_bound_ok
         |FROM q""".stripMargin
    }) { (s, d) =>
      import graft.functions.TextFns.scaledVec
      def codeOf(x: org.apache.spark.sql.Column, scale: org.apache.spark.sql.Column) =
        floor(x * 127.0 / scale + 0.5).cast("long")
      val sv = graft.Tables.embeddings(s, d)
        .select(col("vec_id"), scaledVec(col("embedding")).as("v"))
        .withColumn("scale",
          greatest(array_max(transform(col("v"), x => abs(x))), lit(1L)))
      sv.select(col("vec_id"), col("scale"),
          array_max(transform(col("v"),
            x => abs(codeOf(x, col("scale"))))).as("max_code"),
          aggregate(col("v"), lit(0L), (acc, x) => {
            val e = x - codeOf(x, col("scale")) * col("scale") / 127.0
            acc + floor(e * e + 0.5).cast("long")
          }).as("l2_err_q"))
        .select(col("vec_id"), col("scale").cast("long").as("scale"),
          col("max_code").cast("long").as("max_code"), col("l2_err_q"),
          (col("max_code") <= 127).as("within_range"),
          (col("l2_err_q") <= floor(lit(64.0) * (col("scale") / 254.0) *
            (col("scale") / 254.0)).cast("long") + 64).as("err_bound_ok"))
    },

    // Link prediction on the kNN GRAPH, evaluated the way the literature
    // evaluates it — EDGE HOLDOUT: every vector's top-3 exact-cosine
    // neighbors form a symmetric graph (dense by construction at every
    // SF, unlike the near-dup pair graphs whose families are 2-cliques
    // at sf0.01); a deterministic ~1/7 of its edges are hidden
    // ((a·31+b) mod 7), candidates are scored on the remaining graph by
    // common-neighbor Jaccard |N(u)∩N(v)| / |N(u)∪N(v)|, and each
    // top-20 prediction carries whether it recovered a held-out true
    // edge. Common neighbors come from the UNDIRECTED wedge join (z's
    // fan-out is deg(z)²), so hub wedges cap at deg ≤ 64 — the standard
    // common-neighbor-feature practice at scale. Graph build cost: one
    // all-vectors brute scoring pass (queries broadcast, CosTopK
    // map-side heaps); at 100 TB the edge list comes from the LSH/IVF
    // candidate paths instead — everything downstream is unchanged.
    checked("graph_link_pred",
      s"""WITH sv AS ($svSql),
         |q AS (SELECT vec_id AS q_id, v AS qv, n2 AS qn2 FROM sv),
         |scored AS (
         |  SELECT q_id, vec_id, ${sqlDotInt("qv", "v", Dim)} /
         |    (sqrt(qn2) * sqrt(n2)) AS cos
         |  FROM q JOIN sv ON vec_id <> q_id),
         |ranked AS (SELECT q_id, vec_id,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id)
         |      AS rnk FROM scored),
         |e AS (SELECT DISTINCT least(q_id, vec_id) AS doc_a,
         |    greatest(q_id, vec_id) AS doc_b FROM ranked WHERE rnk <= 3),
         |train AS (SELECT doc_a, doc_b FROM e
         |  WHERE (doc_a * 31 + doc_b) % 7 <> 0),
         |hold AS (SELECT doc_a, doc_b FROM e
         |  WHERE (doc_a * 31 + doc_b) % 7 = 0),
         |und AS (SELECT doc_a AS u, doc_b AS v FROM train
         |  UNION ALL SELECT doc_b, doc_a FROM train),
         |dg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY u),
         |zok AS (SELECT e2.u, e2.v FROM und e2 JOIN dg ON e2.u = dg.u
         |  WHERE dg.deg <= 64),
         |cand AS (SELECT a.v AS x, b.v AS y,
         |    CAST(count(*) AS BIGINT) AS common
         |  FROM zok a JOIN zok b ON a.u = b.u AND a.v < b.v
         |  GROUP BY 1, 2),
         |nonedge AS (SELECT x, y, common FROM cand
         |  WHERE NOT EXISTS (SELECT 1 FROM train
         |    WHERE doc_a = x AND doc_b = y)),
         |sc AS (SELECT x, y, common, dx.deg AS degx, dy.deg AS degy,
         |    CAST(common AS DOUBLE) /
         |      CAST(dx.deg + dy.deg - common AS DOUBLE) AS score
         |  FROM nonedge JOIN dg dx ON x = dx.u JOIN dg dy ON y = dy.u),
         |rk AS (SELECT x, y, common, degx, degy, score,
         |    row_number() OVER (ORDER BY score DESC, x, y) AS rnk FROM sc)
         |SELECT x, y, common, degx, degy,
         |  ${graft.functions.DetAgg.sqlR6("score")} AS score, rnk,
         |  EXISTS (SELECT 1 FROM hold WHERE doc_a = x AND doc_b = y)
         |    AS is_holdout_edge
         |FROM rk WHERE rnk <= 20""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val sv = svSpark(s, d)
      val nn = topK(scoredBrute(sv, Long.MaxValue), 3)
      val e = staged(nn.select(
        least(col("q_id"), col("vec_id")).as("doc_a"),
        greatest(col("q_id"), col("vec_id")).as("doc_b")).distinct())
      val holdMask = (col("doc_a") * 31 + col("doc_b")) % 7 === 0
      val train = e.filter(!holdMask)
      val hold = e.filter(holdMask)
      val und = train.select(col("doc_a").as("u"), col("doc_b").as("v"))
        .unionAll(train.select(col("doc_b").as("u"), col("doc_a").as("v")))
      val dg = staged(und.groupBy("u").agg(count(lit(1)).as("deg")))
      val zok = und.join(dg, "u").filter(col("deg") <= 64)
        .select(col("u"), col("v"))
      val cand = zok.as("a").join(zok.as("b"),
          col("a.u") === col("b.u") && col("a.v") < col("b.v"))
        .groupBy(col("a.v").as("x"), col("b.v").as("y"))
        .agg(count(lit(1)).as("common"))
      val nonedge = cand.join(
        train.select(col("doc_a").as("x"), col("doc_b").as("y")),
        Seq("x", "y"), "left_anti")
      val sc = nonedge
        .join(dg.select(col("u").as("x"), col("deg").as("degx")), "x")
        .join(dg.select(col("u").as("y"), col("deg").as("degy")), "y")
        .withColumn("score", col("common").cast("double") /
          (col("degx") + col("degy") - col("common")).cast("double"))
      // Global top-20 as a bounded TakeOrderedAndProject (per-partition
      // heaps, never a single-partition sort of every scored pair); the
      // rank is then restated by a window over the ALREADY-BOUNDED 20
      // rows — same total order, same output, no global funnel.
      sc.orderBy(col("score").desc, col("x"), col("y")).limit(20)
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("score").desc, col("x"), col("y"))))
        .join(hold.select(col("doc_a").as("x"), col("doc_b").as("y"),
          lit(true).as("ishold")), Seq("x", "y"), "left")
        .select(col("x"), col("y"), col("common"), col("degx"), col("degy"),
          graft.functions.DetAgg.r6(col("score")).as("score"), col("rnk"),
          coalesce(col("ishold"), lit(false)).as("is_holdout_edge"))
    },

    // Confusion matrix + per-class precision/recall/F1 from the SAME kNN
    // decision rule as ml_knn_classify (one shared SQL prefix / Spark
    // helper, so the two queries cannot drift apart): per true class,
    // TP / FP / FN counted over the 50-query eval set, the three
    // derived metrics as exact-integer rationals with one IEEE division
    // each (F1 spelled 2TP/(2TP+FP+FN) — no intermediate rounding).
    // Zero-denominator classes pin the metric to 0, not NULL.
    checked("ml_confusion_matrix",
      s"""$knnVotesSql,
         |pred AS (SELECT q_id, true_label, CAST(min(label) AS INT)
         |    AS predicted FROM best WHERE c = mx GROUP BY q_id, true_label),
         |cls AS (SELECT DISTINCT true_label AS cls FROM pred),
         |m AS (SELECT cls,
         |    CAST((SELECT count(*) FROM pred
         |      WHERE true_label = cls AND predicted = cls) AS BIGINT) AS tp,
         |    CAST((SELECT count(*) FROM pred
         |      WHERE true_label <> cls AND predicted = cls) AS BIGINT) AS fp,
         |    CAST((SELECT count(*) FROM pred
         |      WHERE true_label = cls AND predicted <> cls) AS BIGINT) AS fn
         |  FROM cls)
         |SELECT cls, tp, fp, fn,
         |  CASE WHEN tp + fp = 0 THEN 0.0 ELSE ${graft.functions.DetAgg
            .sqlR6("CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)")} END
         |    AS precision,
         |  CASE WHEN tp + fn = 0 THEN 0.0 ELSE ${graft.functions.DetAgg
            .sqlR6("CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)")} END
         |    AS recall,
         |  CASE WHEN 2 * tp + fp + fn = 0 THEN 0.0 ELSE ${graft.functions
            .DetAgg.sqlR6(
              "CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE)")} END
         |    AS f1
         |FROM m""".stripMargin) { (s, d) =>
      val pred = knnPredictions(s, d)
      val byTrue = pred.groupBy(col("true_label").as("cls"))
        .agg(sum(when(col("predicted") === col("true_label"), 1L)
          .otherwise(0L)).as("tp"),
          sum(when(col("predicted") =!= col("true_label"), 1L).otherwise(0L))
            .as("fn"))
      val fps = pred.filter(col("predicted") =!= col("true_label"))
        .groupBy(col("predicted").as("cls")).agg(count(lit(1)).as("fp"))
      def safe(num: org.apache.spark.sql.Column,
               den: org.apache.spark.sql.Column) =
        when(den === 0, lit(0.0)).otherwise(
          graft.functions.DetAgg.r6(num.cast("double") / den.cast("double")))
      byTrue.join(fps, Seq("cls"), "left")
        .select(col("cls"), col("tp"),
          coalesce(col("fp"), lit(0L)).as("fp"), col("fn"))
        .select(col("cls"), col("tp"), col("fp"), col("fn"),
          safe(col("tp"), col("tp") + col("fp")).as("precision"),
          safe(col("tp"), col("tp") + col("fn")).as("recall"),
          safe(lit(2) * col("tp"),
            lit(2) * col("tp") + col("fp") + col("fn")).as("f1"))
    },

    // kNN CLASSIFICATION on top of the exact top-k machinery — the eval
    // consumer an ANN index ultimately serves: each of the first 50
    // vectors is classified by majority vote over its 5 nearest
    // neighbors (all other vectors, exact cosine; ties in the vote break
    // to the LOWEST label so the decision is deterministic). Same scale
    // shape as ann_cosine_topk (query set broadcast, one corpus pass,
    // CosTopK bounded heaps reduce map-side); the vote itself touches
    // only queries×k rows, and the 2-column label table broadcasts.
    checked("ml_knn_classify",
      s"""$knnVotesSql
         |SELECT q_id, true_label, CAST(min(label) AS INT) AS predicted,
         |  CAST(max(mx) AS BIGINT) AS votes,
         |  min(label) = true_label AS correct
         |FROM best WHERE c = mx GROUP BY q_id, true_label""".stripMargin) { (s, d) =>
      knnPredictions(s, d)
        .select(col("q_id"), col("true_label"), col("predicted"), col("votes"),
          (col("predicted") === col("true_label")).as("correct"))
    },

    // NDCG@10 of the kNN ranking — the graded ranking metric that
    // closes the eval family (AUC scores the classifier, lift the
    // targeting, NDCG the RANKER): relevance = neighbor shares the
    // query's label, DCG discounts by 1/log₂(i+1). The discounts are
    // PRE-QUANTIZED LITERALS (round(1e6/log₂(i+1)) computed once at
    // plan build and injected into BOTH engines), so DCG/IDCG are exact
    // integer sums — no runtime transcendental anywhere — and the ideal
    // ranking's IDCG is a literal prefix-sum lookup at n_hits. One
    // shared IEEE division per query, zero-hit queries pinned to 0.
    checked("ml_ndcg", {
      val w = (1 to 10).map(i =>
        math.round(1e6 / (math.log(i + 1) / math.log(2))))
      val prefix = w.scanLeft(0L)(_ + _) // prefix(k) = ideal DCG of k hits
      val wCase = (1 to 10).map(i => s"WHEN ${i} THEN ${w(i - 1)}")
        .mkString("CASE rnk ", " ", " END")
      val prefixList = prefix.mkString("[", ", ", "]")
      s"""WITH sv AS ($svSql),
         |q AS (SELECT vec_id AS q_id, label AS true_label, v AS qv, n2 AS qn2
         |  FROM sv WHERE vec_id < $RecallQueries),
         |scored AS (
         |  SELECT q_id, true_label, vec_id, label,
         |    ${sqlDotInt("qv", "v", Dim)} / (sqrt(qn2) * sqrt(n2)) AS cos
         |  FROM q JOIN sv ON vec_id <> q_id),
         |ranked AS (SELECT q_id, true_label, label,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id)
         |      AS rnk
         |  FROM scored),
         |h AS (SELECT q_id, true_label,
         |    CAST(sum(CASE WHEN label = true_label
         |      THEN $wCase ELSE 0 END) AS BIGINT) AS dcg_q,
         |    CAST(count(*) FILTER (WHERE label = true_label) AS BIGINT)
         |      AS n_hits
         |  FROM ranked WHERE rnk <= 10 GROUP BY 1, 2)
         |SELECT q_id, true_label, n_hits,
         |  CASE WHEN n_hits = 0 THEN 0.0 ELSE
         |    ${graft.functions.DetAgg.sqlR6(
             s"CAST(dcg_q AS DOUBLE) / " +
               s"CAST(($prefixList)[n_hits + 1] AS DOUBLE)")} END AS ndcg
         |FROM h""".stripMargin
    }) { (s, d) =>
      val w = (1 to 10).map(i =>
        math.round(1e6 / (math.log(i + 1) / math.log(2))))
      val prefix = w.scanLeft(0L)(_ + _)
      val sv = svSpark(s, d)
      val nn = topK(scoredBrute(sv, RecallQueries), 10)
      val labels = graft.Tables.embeddings(s, d).select(col("vec_id"), col("label"))
      val wCol = (1 to 10).foldLeft(lit(0L)) { (acc, i) =>
        when(col("rnk") === i, lit(w(i - 1))).otherwise(acc)
      }
      val h = nn.join(broadcast(labels), "vec_id")
        .join(broadcast(labels.select(col("vec_id").as("q_id"),
          col("label").as("true_label"))), "q_id")
        .groupBy("q_id", "true_label")
        .agg(sum(when(col("label") === col("true_label"), wCol)
          .otherwise(0L)).as("dcg_q"),
          sum(when(col("label") === col("true_label"), 1L).otherwise(0L))
            .as("n_hits"))
      h.select(col("q_id"), col("true_label"), col("n_hits"),
        when(col("n_hits") === 0, lit(0.0)).otherwise(
          graft.functions.DetAgg.r6(col("dcg_q").cast("double") /
            element_at(typedLit(prefix), (col("n_hits") + 1).cast("int"))
              .cast("double"))).as("ndcg"))
    },

    // SRP-LSH bucketed ANN: candidates = same-bucket vectors only.
    checked("ann_srp_lsh",
      s"""WITH sv AS ($svSql),
         |bk AS ($bkSql),
         |$srpScoredSql,
         |${rankedTailSql(5)}""".stripMargin) { (s, d) =>
      val bk = svSpark(s, d).withColumn("bucket", srpBucket(col("v"), SrpBits, Dim))
      topK(scoredSrp(bk), 5)
    },

    // Multi-probe SRP-LSH (one table, nBits+1 probes ≈ the recall of
    // 2^nBits/(nBits+1)× more tables with no extra index storage).
    checked("ann_srp_multiprobe",
      s"""WITH sv AS ($svSql),
         |bk AS ($bkSql),
         |$mpScoredSql,
         |${rankedTailSql(5)}""".stripMargin) { (s, d) =>
      val bk = QuerySpec.staged(
        svSpark(s, d).withColumn("bucket", srpBucket(col("v"), SrpBits, Dim)))
      topK(scoredSrpMultiprobe(bk), 5)
    },

    // IVF-style ANN; recall/cost trades via IvfProbe exactly as in a
    // production IVF index.
    checked("ann_ivf",
      s"""WITH sv AS ($svSql),
         |$ivfScoredSql,
         |${rankedTailSql(5)}""".stripMargin) { (s, d) =>
      topK(scoredIvf(svSpark(s, d)), 5)
    },

    // PERSISTED incremental IVF index — the index-maintenance lifecycle
    // the one-shot ann_ivf summarizes away: a 100 TB embedding corpus
    // never re-assigns history when a new batch lands; it appends the
    // batch's list assignments (computed against the FROZEN centroids —
    // no retrain) into a store PARTITIONED BY list id, and queries read
    // only their probed partitions. This query builds that store once
    // per (JVM, sf) in two writes — a base build (vec_id % 10 <> 7) and
    // an appended "new batch" (vec_id % 10 = 7) through the same frozen
    // quantizer — then answers the standard top-5 THROUGH the store:
    // parquet round-trip + partition layout + append visibility are all
    // on the hashed path. The oracle is ann_ivf's own computing DuckDB
    // chain over the raw table, so the gate is the append-consistency
    // IDENTITY: an incrementally-built index must answer byte-for-byte
    // like a from-scratch build (frozen centroids ⇒ assignment is
    // arrival-order-free). Scale shape: queries broadcast; the store
    // scan is list-partition-local (nProbe/nList of the data at any
    // corpus size); top-5 reduces map-side through the bounded heap.
    checked("ann_ivf_incremental",
      s"""WITH sv AS ($svSql),
         |$ivfScoredSql,
         |${rankedTailSql(5)}""".stripMargin) { (s, d) =>
      val sv = svSpark(s, d)
      val (asg, probeArr) = ivfAssignProbe(sv)
      val dir = TmpDirs.scoped(s"graft_ivfstore_${QuerySpec.jvmScopedKey(d)}")
      val ready = new java.io.File(dir, "_READY")
      val store = new java.io.File(dir, "index").getAbsolutePath
      if (!ready.exists()) {
        asg.filter(col("vec_id") % 10 =!= 7)
          .write.mode("overwrite").partitionBy("c_id").parquet(store)
        asg.filter(col("vec_id") % 10 === 7)
          .write.mode("append").partitionBy("c_id").parquet(store)
        ready.createNewFile()
      }
      ivfStoreTopK(s, sv, probeArr, store)
    },

    // STREAMING ingestion into the same index lifecycle — the feed side
    // of ann_ivf_incremental: embeddings arrive as a bounded two-batch
    // stream (base corpus, then the new batch) and a foreachBatch sink
    // assigns each micro-batch against the FROZEN quantizer and appends
    // it into a list-partitioned store — exactly how a production vector
    // index absorbs a crawl feed (assignment is a pure literal-centroid
    // projection, so ingest cost is one scan of each batch, zero
    // shuffle; the store grows by partition-local appends). The drained
    // store then answers the standard top-5, and the oracle is again
    // ann_ivf's computing DuckDB chain over the raw table: the
    // STREAM-FED index must answer byte-for-byte like a from-scratch
    // batch build — arrival order, micro-batch boundaries, and the
    // foreachBatch append path all provably invisible to queries.
    checked("stream_ivf_ingest",
      s"""WITH sv AS ($svSql),
         |$ivfScoredSql,
         |${rankedTailSql(5)}""".stripMargin) { (s, d) =>
      val sv = svSpark(s, d)
      val quant = ivfQuantizer(sv)
      val dir = TmpDirs.scoped(s"graft_ivfstream_${QuerySpec.jvmScopedKey(d)}")
      val ready = new java.io.File(dir, "_READY")
      val store = new java.io.File(dir, "index").getAbsolutePath
      if (!ready.exists()) {
        // A died-mid-ingest store would double-append on retry: rebuild
        // from scratch whenever the marker is absent.
        def rmTree(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
          f.delete(): Unit
        }
        rmTree(dir); dir.mkdirs()
        val feed = new java.io.File(dir, "feed"); feed.mkdirs()
        def oneFile(df: DataFrame, name: String, bumpMs: Long): java.io.File = {
          val stage = new java.io.File(dir, s".stage_$name")
          df.coalesce(1).write.mode("overwrite").parquet(stage.getAbsolutePath)
          val part = stage.listFiles().filter(f =>
            f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).head
          val target = new java.io.File(feed, name)
          java.nio.file.Files.move(part.toPath, target.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          rmTree(stage)
          java.nio.file.Files.setLastModifiedTime(target.toPath,
            java.nio.file.attribute.FileTime.fromMillis(
              System.currentTimeMillis() + bumpMs))
          target
        }
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding"), col("label"))
        oneFile(emb.filter(col("vec_id") % 10 =!= 7), "base.parquet", 0L)
        // mtime +2 s: FileStreamSource orders micro-batches by file
        // modification time; the new batch must arrive second.
        oneFile(emb.filter(col("vec_id") % 10 === 7), "batch.parquet", 2000L)
        val ingest = s.readStream
          .schema(org.apache.spark.sql.types.StructType.fromDDL(
            "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"))
          .option("maxFilesPerTrigger", 1)
          .parquet(feed.getAbsolutePath)
          .writeStream
          .foreachBatch { (b: DataFrame, _: Long) =>
            b.select(col("vec_id"), scaledVec(col("embedding")).as("v"))
              .withColumn("n2", dotInt(col("v"), col("v")))
              .select(col("vec_id"), col("v"), col("n2"),
                quant.cId.as("c_id"))
              .write.mode("append").partitionBy("c_id").parquet(store)
            ()
          }
          .option("checkpointLocation",
            new java.io.File(dir, "ckpt").getAbsolutePath)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        ingest.awaitTermination()
        ready.createNewFile(): Unit
      }
      ivfStoreTopK(s, sv, quant.probe, store)
    },

    // Product quantization (the compression half of a production IVF-PQ
    // index) with asymmetric-distance (ADC) search. The corpus is
    // ENCODED: each vector becomes PqM 3-bit codes (argmin codeword per
    // subspace, exact scaled-integer L2, ties to the lowest code) — a
    // 170× reduction vs the 64×4-byte float vector, which is the entire
    // point at 100 TB: the encoded corpus rides in executor memory while
    // the raw vectors stay on disk. A query never decodes anything:
    // its per-subspace lookup table (PqKs exact distances q_sub →
    // codeword) is computed once in the projection and carried through
    // the broadcast, so the scan cost per (query, vector) pair is PqM
    // array lookups + adds — all BIGINT, so the ADC scores (and the
    // ranking) are bit-exact with zero float ops. Plan: codebook =
    // bounded driver state inlined as literals (the ann_ivf quantizer
    // contract); encode and LUT build are zero-shuffle projections; the
    // scan is a broadcast nested-loop over the ENCODED rows only; the
    // top-k reduces map-side through the bounded heap (O(q·k) crosses
    // the exchange). Ranking quality is intrinsically below exact search
    // (quantization error) — the contract here is the exact integer ADC
    // semantics; the recall ladder economics live in ann_recall.
    checked("ann_pq",
      s"""WITH sv AS ($svSql),
         |ms AS (SELECT range AS m FROM range(0, $PqM)),
         |cw AS (SELECT e.vec_id - $PqBase AS c, m.m,
         |    e.v[m.m * $PqSub + 1 : m.m * $PqSub + $PqSub] AS cv
         |  FROM sv e, ms m
         |  WHERE e.vec_id >= $PqBase AND e.vec_id < ${PqBase + PqKs}),
         |sub AS (SELECT vec_id, m.m,
         |    v[m.m * $PqSub + 1 : m.m * $PqSub + $PqSub] AS xv FROM sv, ms m),
         |d AS (SELECT s.vec_id, s.m, c.c,
         |    CAST(list_aggregate(list_transform(range(1, ${PqSub + 1}),
         |      i -> (s.xv[i] - c.cv[i]) * (s.xv[i] - c.cv[i])), 'sum')
         |      AS BIGINT) AS dd
         |  FROM sub s JOIN cw c ON s.m = c.m),
         |code AS (SELECT vec_id, m, c FROM (SELECT vec_id, m, c,
         |    row_number() OVER (PARTITION BY vec_id, m ORDER BY dd, c) AS rn
         |  FROM d) WHERE rn = 1),
         |adc AS (SELECT qd.vec_id AS q_id, x.vec_id AS vec_id,
         |    CAST(sum(qd.dd) AS BIGINT) AS adc
         |  FROM code x JOIN d qd ON qd.m = x.m AND qd.c = x.c
         |  WHERE qd.vec_id < $RecallQueries AND x.vec_id <> qd.vec_id
         |  GROUP BY 1, 2),
         |ranked AS (SELECT q_id, vec_id, adc,
         |    row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rnk
         |  FROM adc)
         |SELECT q_id, rnk, vec_id, adc FROM ranked
         |WHERE rnk <= $TopK""".stripMargin) { (s, d) =>
      val sv = svSpark(s, d)
      // Codebook to the driver: PqKs bounded rows (trained centrally and
      // shipped to workers in any production PQ index), split into
      // per-subspace codewords.
      val cwRows = sv
        .filter(col("vec_id") >= PqBase && col("vec_id") < PqBase + PqKs)
        .select(col("vec_id"), col("v")).collect()
        .sortBy(_.getLong(0))
        .map(_.getSeq[Long](1).toIndexedSeq)
      def cv(c: Int, m: Int): IndexedSeq[Long] =
        cwRows(c).slice(m * PqSub, (m + 1) * PqSub)
      val subCol = (0 until PqM).map(m => slice(col("v"), m * PqSub + 1, PqSub))
      // Exact per-subspace squared distance of this row's m-th subvector
      // to codeword c: ‖x_m‖² − 2·x_m·c + ‖c‖², every term a BIGINT.
      def dCols(m: Int): IndexedSeq[Column] = {
        val xn2 = DotLong(subCol(m), subCol(m))
        (0 until PqKs).map { c =>
          val cvm = cv(c, m)
          xn2 - lit(2L) * DotLong(subCol(m), array(cvm.map(lit): _*)) +
            lit(cvm.map(x => x * x).sum)
        }
      }
      // Corpus encode: argmin over the distance array; array_position
      // finds the FIRST min = lowest code id on ties (the oracle's
      // ORDER BY dd, c).
      val codeCols = (0 until PqM).map { m =>
        val dArr = array(dCols(m): _*)
        (array_position(dArr, array_min(dArr)) - 1L).cast("int").as(s"code$m")
      }
      val enc = sv.select(col("vec_id") +: codeCols: _*)
      // Query LUTs: the same distance arrays, kept whole (indexed by the
      // corpus side's code at scan time).
      val q = sv.filter(col("vec_id") < RecallQueries)
        .select(col("vec_id").as("q_id") +:
          (0 until PqM).map(m => array(dCols(m): _*).as(s"lut$m")): _*)
      val adcCol = (0 until PqM).map(m =>
        element_at(col(s"lut$m"), col(s"code$m") + 1)).reduce(_ + _)
      // Negate into the (cos DESC, vec_id ASC) heap order so the shared
      // bounded-heap top-k ranks ascending ADC distance; the values are
      // integers (exact in double), restored on output.
      val scored = broadcast(q).join(enc, col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), (-adcCol).cast("double").as("cos"))
      // topK's r6 display rounding multiplies by 1e6 first — fine for
      // cosines in [-1, 1], but at ~1e12 ADC magnitudes that leaves
      // double's exact-integer range; rank through the same bounded heap
      // and restore the raw integer instead.
      scored.groupBy("q_id")
        .agg(graft.functions.expr.CosTopK.topk(col("cos"), col("vec_id"), TopK).as("tk"))
        .select(col("q_id"), explode(col("tk")).as("t"))
        .select(col("q_id"), col("t.rnk").as("rnk"), col("t.vec_id").as("vec_id"),
          (-col("t.cos")).cast("long").as("adc"))
    },

    // IVF-PQ — the production ANN layout itself (FAISS's IndexIVFPQ:
    // coarse quantizer partitions the corpus into inverted lists, PQ
    // compresses each vector's RESIDUAL to its list centroid, search
    // probes nProbe lists with a per-list residual LUT). This composes
    // the two halves already pinned separately (ann_ivf's coarse
    // assignment, ann_pq's ADC) into the combined index: residual
    // encoding is what makes PQ codes tight enough to be useful —
    // within a list the residual spread is a fraction of the corpus
    // spread, so the same PqKs codewords quantize far finer. Everything
    // stays exact BIGINT: residuals are differences of scaled ints,
    // per-subspace squared distances ≤ 16·(4e6)² ≈ 2.6e14 and ADC sums
    // ≤ ~1e15 — inside double's 2^53 exact-integer range, so the CosTopK
    // heap ranks exact values. Codebook = residuals of the PqBase sample
    // rows (the fixed-id init convention of ann_ivf/ann_pq/kmeans);
    // queries compute a FRESH LUT per probed list (the per-list residual
    // q − centroid — the detail that distinguishes IVFPQ from flat PQ).
    // Plan: centroids + 8 codewords are bounded driver state inlined as
    // literals; assignment/residual/encode are projections over ONE
    // staged corpus pass; candidates come from the c_id equi-join
    // against the probed lists (never the whole corpus); top-k reduces
    // map-side through the bounded heap.
    checked("ann_ivfpq",
      s"""WITH sv AS ($svSql),
         |$ivfpqChainSql,
         |ranked AS (SELECT q_id, vec_id, adc,
         |    row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rnk
         |  FROM adc)
         |SELECT q_id, rnk, vec_id, adc FROM ranked
         |WHERE rnk <= 5""".stripMargin) { (s, d) =>
      scoredIvfpqTop5(s, d)
    },

    // Recall@5 of the combined IVF-PQ index against the brute-force
    // truth — the quality contract of the compressed index, measured
    // (the ann_recall pattern): identical candidate lists to exact-
    // distance IVF, but ADC ranks by quantized residual distance, so
    // hits can only be LOST to quantization error — recall_ivfpq ≤
    // recall_ivf structurally, and THIS query puts the measured cost
    // of 170× compression next to the ladder the other recall query
    // pins: mean recall ≈ 0.05 vs exact-IVF's ≈ 0.46 at sf0.01 — the
    // honest story for an 8-codeword × 4-subspace codebook quantizing
    // near-uniform random vectors (no cluster structure for the
    // residuals to exploit; a production deployment sizes Ks/M against
    // THIS measurement on its own corpus). Deterministic end to end
    // (exact-integer ADC, total tie order), hence oracle-checked like
    // every measurement here.
    checked("ann_recall_ivfpq",
      s"""WITH sv AS ($svSql),
         |$ivfpqChainSql,
         |pq5 AS (SELECT q_id, vec_id FROM (
         |  SELECT q_id, vec_id,
         |    row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rnk
         |  FROM adc) WHERE rnk <= 5),
         |qt AS (SELECT vec_id AS q_id, v AS qv, n2 AS qn2 FROM sv WHERE vec_id < $RecallQueries),
         |tscored AS (
         |  SELECT q_id, vec_id, ${sqlDotInt("qv", "v", Dim)} / (sqrt(qn2) * sqrt(n2)) AS cos
         |  FROM qt JOIN sv ON vec_id <> q_id),
         |truth AS (SELECT q_id, vec_id FROM (
         |  SELECT q_id, vec_id,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
         |  FROM tscored) WHERE rnk <= 5),
         |hits AS (SELECT a.q_id, count(*) AS n_hits
         |  FROM pq5 a JOIN truth t ON a.q_id = t.q_id AND a.vec_id = t.vec_id
         |  GROUP BY a.q_id)
         |SELECT q.q_id, CAST(COALESCE(n_hits, 0) AS BIGINT) AS n_hits,
         |  COALESCE(n_hits, 0) / 5.0 AS recall_at_5
         |FROM (SELECT q_id FROM qt) q LEFT JOIN hits ON q.q_id = hits.q_id""".stripMargin) { (s, d) =>
      val sv = svSpark(s, d)
      val truth = topK(scoredBrute(sv, RecallQueries), 5)
        .select(col("q_id"), col("vec_id"))
      val pq5 = scoredIvfpqTop5(s, d).select(col("q_id"), col("vec_id"))
      val hits = pq5.join(truth, Seq("q_id", "vec_id"))
        .groupBy("q_id").agg(count(lit(1)).as("n_hits"))
      sv.filter(col("vec_id") < RecallQueries)
        .select(col("vec_id").as("q_id"))
        .join(hits, Seq("q_id"), "left")
        .select(col("q_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          (coalesce(col("n_hits"), lit(0L)) / 5.0).as("recall_at_5"))
    },

    // The IVFPQ KNOB LADDER (round-11 verdict #5): recall@5 of three
    // (nProbe, ks) operating points of the SAME chain — the production
    // point (2, 8), the half-codebook point (2, 4), and the single-probe
    // point (1, 8) — against the brute-force truth, with the knob
    // relationships pinned as oracle-checked booleans (the ann_recall
    // ladder pattern): `ladder_ks` asserts the codebook knob buys recall
    // (hits at ks=4 < hits at ks=8, strict at both verify SFs — a
    // codebook-size regression flips a hash, not just a number), and
    // `probe_diverges` asserts the probe knob actually changes the
    // selection (some (q, v) in the 2-probe top-5 is absent from the
    // 1-probe top-5 — an nProbe stuck at 1 makes the sets identical and
    // fails the oracle). The probe knob's RECALL is deliberately NOT
    // pinned as an ordering: measured, it inverts across SFs (sf0.01:
    // 11 < 13; sf0.1: 7 > 6 — extra probed candidates can displace true
    // hits under quantized ADC ranking), which is itself the honest
    // design signal the per-(op, query) hashed hit counts record. ONE
    // staged corpus pass (assignment + residuals) feeds all three
    // points; each point re-derives only its codebook/LUT literals and
    // reduces through the bounded heap.
    checked("ann_ivfpq_ladder", {
      def pqTop5(np: Int, ks: Int) =
        s"""(SELECT q_id, vec_id FROM (
           |  SELECT q_id, vec_id,
           |    row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rnk
           |  FROM (WITH ${ivfpqChainSqlFor(np, ks)} SELECT * FROM adc))
           |  WHERE rnk <= 5)""".stripMargin
      s"""WITH sv AS ($svSql),
         |qt AS (SELECT vec_id AS q_id, v AS qv, n2 AS qn2 FROM sv WHERE vec_id < $RecallQueries),
         |tscored AS (
         |  SELECT q_id, vec_id, ${sqlDotInt("qv", "v", Dim)} / (sqrt(qn2) * sqrt(n2)) AS cos
         |  FROM qt JOIN sv ON vec_id <> q_id),
         |truth AS (SELECT q_id, vec_id FROM (
         |  SELECT q_id, vec_id,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
         |  FROM tscored) WHERE rnk <= 5),
         |pa AS ${pqTop5(1, PqKs)},
         |pb AS ${pqTop5(2, PqKs / 2)},
         |pc AS ${pqTop5(2, PqKs)},
         |appx AS (SELECT 'p1_ks8' AS op, q_id, vec_id FROM pa
         |  UNION ALL SELECT 'p2_ks4', q_id, vec_id FROM pb
         |  UNION ALL SELECT 'p2_ks8', q_id, vec_id FROM pc),
         |hits AS (SELECT op, a.q_id, count(*) AS n_hits
         |  FROM appx a JOIN truth t ON a.q_id = t.q_id AND a.vec_id = t.vec_id
         |  GROUP BY op, a.q_id),
         |pairs AS (SELECT m.op, q.q_id
         |  FROM (SELECT unnest(['p1_ks8', 'p2_ks4', 'p2_ks8']) AS op) m
         |  CROSS JOIN (SELECT q_id FROM qt) q)
         |SELECT pairs.op, pairs.q_id,
         |  CAST(COALESCE(n_hits, 0) AS BIGINT) AS n_hits,
         |  COALESCE(n_hits, 0) / 5.0 AS recall_at_5,
         |  true AS ladder_ks, true AS probe_diverges
         |FROM pairs LEFT JOIN hits
         |  ON pairs.op = hits.op AND pairs.q_id = hits.q_id""".stripMargin
    }) { (s, d) =>
      val (out0, appx) = ivfpqLadderHits(s, d)
      val out = QuerySpec.staged(out0)
      // bounded collects: 3 op totals + one anti-join count (the
      // ann_recall ladder-boolean contract)
      val hitsByOp = out.groupBy("op").agg(sum(col("n_hits")).as("h"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val diverges = appx.filter(col("op") === "p2_ks8")
        .join(appx.filter(col("op") === "p1_ks8")
          .select(col("q_id"), col("vec_id")),
          Seq("q_id", "vec_id"), "left_anti")
        .count() > 0
      out
        .withColumn("ladder_ks",
          lit(hitsByOp("p2_ks4") < hitsByOp("p2_ks8")))
        .withColumn("probe_diverges", lit(diverges))
    },

    // Recall@5 of each approximate operator against the brute-force truth,
    // per query vector. Both sides are deterministic (exact-integer
    // cosines, total tie order), so the measurement itself is
    // oracle-checked. This is what tells a user whether the 6-bit SRP /
    // Hamming-1 multiprobe / nProbe=2 IVF operating points are usable, not
    // just correctly computed — measured at sf0.01 (5 000 synthetic 64-d
    // vectors): srp ≈ 0.04, srp_mp ≈ 0.25, ivf ≈ 0.46 mean recall. Low
    // absolute numbers are the honest story for near-uniform random
    // embeddings (no cluster structure to exploit); the ladder between the
    // three is the design signal — each probe/list knob buys recall at
    // linear candidate cost, and a production deployment tunes
    // nBits/probes/nProbe against THIS query on its own corpus. Plan
    // shape: ONE staged corpus pass feeds truth + all three candidate
    // chains; each chain reduces map-side through the bounded-heap top-k
    // before the small hit-count joins.
    checked("ann_recall",
      s"""WITH sv AS ($svSql),
         |bk AS ($bkSql),
         |qt AS (SELECT vec_id AS q_id, v AS qv, n2 AS qn2 FROM sv WHERE vec_id < $RecallQueries),
         |tscored AS (
         |  SELECT q_id, vec_id, ${sqlDotInt("qv", "v", Dim)} / (sqrt(qn2) * sqrt(n2)) AS cos
         |  FROM qt JOIN sv ON vec_id <> q_id),
         |truth AS (SELECT q_id, vec_id FROM (
         |  SELECT q_id, vec_id,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
         |  FROM tscored) WHERE rnk <= 5),
         |srp5 AS (SELECT q_id, vec_id FROM (
         |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
         |  FROM (SELECT q.vec_id AS q_id, bk.vec_id,
         |      ${sqlDotInt("q.v", "bk.v", Dim)} / (sqrt(q.n2) * sqrt(bk.n2)) AS cos
         |    FROM bk q JOIN bk ON q.vec_id < $RecallQueries
         |      AND q.bucket = bk.bucket AND bk.vec_id <> q.vec_id)) WHERE rnk <= 5),
         |mp5 AS (SELECT q_id, vec_id FROM (
         |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
         |  FROM (
         |    WITH qp AS (SELECT vec_id AS q_id, unnest(list_transform(range(0, ${SrpBits + 1}),
         |        i -> CASE WHEN i = 0 THEN bucket
         |             ELSE xor(bucket, CAST(1 AS BIGINT) << (i - 1)) END)) AS probe
         |      FROM bk WHERE vec_id < $RecallQueries),
         |    cand AS (SELECT DISTINCT q_id, bk.vec_id AS vec_id
         |      FROM qp JOIN bk ON qp.probe = bk.bucket AND bk.vec_id <> qp.q_id)
         |    SELECT cand.q_id, cand.vec_id,
         |      ${sqlDotInt("qb.v", "cb.v", Dim)} / (sqrt(qb.n2) * sqrt(cb.n2)) AS cos
         |    FROM cand JOIN bk qb ON cand.q_id = qb.vec_id
         |              JOIN bk cb ON cand.vec_id = cb.vec_id)) WHERE rnk <= 5),
         |ivf5 AS (SELECT q_id, vec_id FROM (
         |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
         |  FROM (WITH $ivfScoredSql SELECT * FROM scored)) WHERE rnk <= 5),
         |appx AS (
         |  SELECT 'srp' AS method, q_id, vec_id FROM srp5
         |  UNION ALL SELECT 'srp_mp', q_id, vec_id FROM mp5
         |  UNION ALL SELECT 'ivf', q_id, vec_id FROM ivf5),
         |hits AS (SELECT method, a.q_id, count(*) AS n_hits
         |  FROM appx a JOIN truth t ON a.q_id = t.q_id AND a.vec_id = t.vec_id
         |  GROUP BY method, a.q_id),
         |pairs AS (SELECT m.method, q.q_id
         |  FROM (SELECT unnest(['srp', 'srp_mp', 'ivf']) AS method) m
         |  CROSS JOIN (SELECT q_id FROM qt) q)
         |SELECT pairs.method, pairs.q_id,
         |  COALESCE(n_hits, 0) AS n_hits,
         |  COALESCE(n_hits, 0) / 5.0 AS recall_at_5,
         |  true AS ladder_srp_lt_mp, true AS ladder_mp_lt_ivf
         |FROM pairs LEFT JOIN hits
         |  ON pairs.method = hits.method AND pairs.q_id = hits.q_id""".stripMargin) { (s, d) =>
      val sv = svSpark(s, d)
      val bk = QuerySpec.staged(
        sv.withColumn("bucket", srpBucket(col("v"), SrpBits, Dim)))
      val truth = topK(scoredBrute(sv, RecallQueries), 5)
        .select(col("q_id"), col("vec_id"))
      val appx = Seq(
        "srp" -> topK(scoredSrp(bk), 5),
        "srp_mp" -> topK(scoredSrpMultiprobe(bk), 5),
        "ivf" -> topK(scoredIvf(sv), 5))
        .map { case (m, df) =>
          df.select(lit(m).as("method"), col("q_id"), col("vec_id"))
        }
        .reduce(_ unionAll _)
      val hits = appx.join(truth, Seq("q_id", "vec_id"))
        .groupBy("method", "q_id")
        .agg(count(lit(1)).as("n_hits"))
      val methodsDf = sv.sparkSession.range(1)
        .select(explode(array(lit("srp"), lit("srp_mp"), lit("ivf"))).as("method"))
      val pairs = sv.filter(col("vec_id") < RecallQueries)
        .select(col("vec_id").as("q_id"))
        .crossJoin(broadcast(methodsDf))
      val out = QuerySpec.staged(
        pairs.join(hits, Seq("method", "q_id"), "left")
          .select(col("method"), col("q_id"),
            coalesce(col("n_hits"), lit(0L)).as("n_hits"),
            (coalesce(col("n_hits"), lit(0L)) / 5.0).as("recall_at_5")))
      // The recall LADDER (each probe/list knob buys recall) asserted as
      // literal-true booleans the oracle pins (round-7 verdict #5, the
      // zorder_effective pattern): a knob regression that flips the
      // srp < multiprobe < ivf ordering now FAILS the oracle hash instead
      // of silently shifting a number. Bounded 3-row aggregate to the
      // driver over the staged result (the IVF-quantizer collect
      // contract); the comparison is on exact hit COUNTS (integers), not
      // float means.
      val hitsByMethod = out.groupBy("method")
        .agg(sum(col("n_hits")).as("h")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      out
        .withColumn("ladder_srp_lt_mp",
          lit(hitsByMethod("srp") < hitsByMethod("srp_mp")))
        .withColumn("ladder_mp_lt_ivf",
          lit(hitsByMethod("srp_mp") < hitsByMethod("ivf")))
    },

    // ------------------------------------------------------------------
    // Distributed k-means TRAINING (Lloyd's algorithm) — the step the
    // IVF/SemDeDup quantizers above deliberately skip by sampling fixed
    // vec_ids; this query closes that loop and trains the coarse
    // quantizer itself. KmIters fixed Lloyd iterations, every step in
    // exact integer arithmetic: assignment by scaled-integer L2
    // (integer-valued doubles, ties → lowest c_id, the ann_ivf argmin),
    // centroid update as component-wise `sum div count` (trunc-toward-
    // zero division — identical on both engines for either sign), and
    // an empty cluster KEEPS its previous centroid (declared
    // semantics). The distributed shape per iteration: one assignment
    // projection over the corpus scan (centroids are literals — the
    // k·dim model state every production k-means broadcasts), one
    // posexplode + (c_id, pos) aggregate for the sums, and one BOUNDED
    // k·dim collect to refresh the literals — exactly MLlib's
    // aggregate-then-broadcast loop, with the argmin in codegen rather
    // than a UDF. Output pins the final assignment and its distortion
    // per vector, so any drift in any round flips the hash.
    checked("ann_kmeans_train", {
      val cents0 = s"SELECT vec_id - $KmInitBase AS c_id, v AS cv FROM sv0 " +
        s"WHERE vec_id >= $KmInitBase AND vec_id < ${KmInitBase + KmK}"
      def assignCte(k: Int): String =
        s"""d$k AS (SELECT s.vec_id, c.c_id,
           |    s.n2 - 2 * ${sqlDotInt("s.v", "c.cv", Dim)}
           |      + ${sqlDotInt("c.cv", "c.cv", Dim)} AS d
           |  FROM svn s CROSS JOIN c${k - 1} c),
           |a$k AS (SELECT vec_id, c_id, d FROM (
           |    SELECT vec_id, c_id, d,
           |      row_number() OVER (PARTITION BY vec_id ORDER BY d, c_id) AS rn
           |    FROM d$k) t WHERE rn = 1)""".stripMargin
      def updateCte(k: Int): String =
        s"""e$k AS (SELECT a.c_id, i AS pos, sum(s.v[i]) AS sm, count(*) AS n
           |  FROM a$k a JOIN svn s USING (vec_id)
           |    CROSS JOIN range(1, ${Dim + 1}) t(i)
           |  GROUP BY a.c_id, i),
           |u$k AS (SELECT c_id, list(sm // n ORDER BY pos) AS cv
           |  FROM e$k GROUP BY c_id),
           |c$k AS (SELECT c.c_id, COALESCE(u.cv, c.cv) AS cv
           |  FROM c${k - 1} c LEFT JOIN u$k u USING (c_id))""".stripMargin
      val iters = (1 to KmIters).map { k =>
        if (k < KmIters) s"${assignCte(k)},\n${updateCte(k)}" else assignCte(k)
      }.mkString(",\n")
      s"""WITH sv0 AS (SELECT vec_id, ${sqlScaledVec("embedding")} AS v FROM embeddings),
         |svn AS (SELECT vec_id, v, ${sqlDotInt("v", "v", Dim)} AS n2 FROM sv0),
         |c0 AS ($cents0),
         |$iters
         |SELECT vec_id, c_id, CAST(d AS BIGINT) AS d
         |FROM a$KmIters""".stripMargin
    }) { (s, d) =>
      val sv = svSpark(s, d)
      def assign(cents: Array[(Long, IndexedSeq[Long])]): DataFrame = {
        val dists = cents.map { case (cid, cv) =>
          val cn2 = cv.map(x => x * x).sum
          (cid, col("n2") - lit(2) * dotInt(array(cv.map(lit): _*), col("v")) + lit(cn2.toDouble))
        }
        val dArr = array(dists.map(_._2): _*)
        val cidArr = array(dists.map(x => lit(x._1)): _*)
        sv.select(col("vec_id"), col("v"),
          element_at(cidArr, array_position(dArr, array_min(dArr)).cast("int"))
            .as("c_id"),
          element_at(dArr, array_position(dArr, array_min(dArr)).cast("int"))
            .as("d"))
      }
      // Init: the same fixed-id sample the IVF quantizer uses (bounded
      // k-row collect — the model state a production trainer broadcasts).
      var cents: Array[(Long, IndexedSeq[Long])] = sv
        .filter(col("vec_id") >= KmInitBase && col("vec_id") < KmInitBase + KmK)
        .select((col("vec_id") - KmInitBase).as("c_id"), col("v"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toIndexedSeq))
        .sortBy(_._1)
      for (k <- 1 to KmIters) {
        val a = assign(cents)
        if (k < KmIters) {
          // Component sums via posexplode → (c_id, pos) aggregate; the
          // k·dim result is the next round's literal centroid state.
          val upd = a.select(col("c_id"), posexplode(col("v")).as(Seq("pos", "x")))
            .groupBy("c_id", "pos")
            .agg(sum(col("x")).as("sm"), count(lit(1)).as("n"))
            .select(col("c_id"), col("pos"), expr("sm DIV n").as("comp"))
            .collect()
            .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
            .groupBy(_._1)
            .map { case (cid, rows) =>
              cid -> rows.sortBy(_._2).map(_._3).toIndexedSeq
            }
          cents = cents.map { case (cid, cv) => (cid, upd.getOrElse(cid, cv)) }
        }
      }
      assign(cents)
        .select(col("vec_id"), col("c_id"), col("d").cast("long").as("d"))
    },

    // Simplified silhouette of the IVF coarse quantizer — the
    // clustering-quality eval the ANN family was missing: for every
    // vector, a = distance to its assigned (nearest) centroid, b =
    // distance to the second-nearest, s = (b−a)/max(a,b) = 1 − a/b.
    // Per-cluster mean silhouette answers "how separable are the IVF
    // lists" — the metric that justifies an nProbe operating point.
    // (Simplified silhouette — centroid distances, not all-pairs — is
    // the standard at-scale form: O(n·k), never O(n²).) Exactness:
    // squared L2 distances are exact integers (scaled-int identity
    // n2 − 2·x·c + cn2), the two sqrt/divide ops are one fixed IEEE
    // tree, per-point s quantized to 1e-6 before the BIGINT sum.
    // Shape: centroids are driver state inlined as literals (the IVF
    // contract), so assignment + both distances are one codegen'd
    // projection; one map-side-combined aggregate to k cells.
    checked("ann_silhouette", {
      val dist = s"(n2 - 2 * ${sqlDotInt("v", "cv", Dim)} + cn2)"
      s"""WITH sv AS ($svSql),
         |cent AS (SELECT vec_id - $IvfCentroidBase AS c_id, v AS cv,
         |    n2 AS cn2
         |  FROM sv WHERE vec_id >= $IvfCentroidBase
         |    AND vec_id < ${IvfCentroidBase + IvfLists}),
         |dd AS (SELECT sv.vec_id, cent.c_id, $dist AS dsq
         |  FROM sv CROSS JOIN cent),
         |r AS (SELECT vec_id, c_id, dsq,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dsq, c_id)
         |      AS rn FROM dd),
         |ab AS (SELECT a.vec_id, a.c_id, a.dsq AS d1, b.dsq AS d2
         |  FROM r a JOIN r b ON a.vec_id = b.vec_id
         |  WHERE a.rn = 1 AND b.rn = 2),
         |sq AS (SELECT c_id, CASE WHEN d2 = 0 THEN 0
         |    ELSE CAST(floor((1.0 - sqrt(CAST(d1 AS DOUBLE)) /
         |      sqrt(CAST(d2 AS DOUBLE))) * 1000000 + 0.5) AS BIGINT) END
         |    AS sq FROM ab)
         |SELECT c_id, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(sq) AS BIGINT) AS sil_sum_q,
         |  ${graft.functions.DetAgg.sqlR6(
             "CAST(sum(sq) AS DOUBLE) / 1000000 / count(*)")} AS mean_sil
         |FROM sq GROUP BY c_id""".stripMargin
    }) { (s, d) =>
      val sv = svSpark(s, d)
      // Quantizer to the driver (the scoredIvf contract): IvfLists
      // rows, inlined as literals → assignment and both nearest
      // distances are one codegen'd projection, zero joins.
      val cents = sv
        .filter(col("vec_id") >= IvfCentroidBase &&
          col("vec_id") < IvfCentroidBase + IvfLists)
        .select((col("vec_id") - IvfCentroidBase).as("c_id"), col("v"),
          col("n2"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toIndexedSeq,
          r.getDouble(2)))
        .sortBy(_._1)
      val dists = cents.map { case (_, cv, cn2) =>
        col("n2") - lit(2) * dotInt(array(cv.map(lit): _*), col("v")) +
          lit(cn2)
      }
      val dArr = array(dists: _*)
      val cidArr = array(cents.map(c => lit(c._1)): _*)
      val sorted = sort_array(dArr)
      val d1 = element_at(sorted, 1)
      val d2 = element_at(sorted, 2)
      // first index of the min → smallest c_id on ties (cidArr is
      // c_id-ordered), matching the SQL (dsq, c_id) rank
      val assigned = element_at(cidArr,
        array_position(dArr, array_min(dArr)).cast("int"))
      sv.select(assigned.as("c_id"),
          when(d2 === 0, 0L).otherwise(
            floor((lit(1.0) - sqrt(d1) / sqrt(d2)) * 1000000 + 0.5)
              .cast("long")).as("sq"))
        .groupBy("c_id")
        .agg(count(lit(1)).as("n"), sum(col("sq")).as("sil_sum_q"),
          graft.functions.DetAgg.r6(
            sum(col("sq")).cast("double") / 1000000 / count(lit(1)))
            .as("mean_sil"))
    },

    // MMR — Maximal Marginal Relevance re-ranking (Carbonell &
    // Goldstein, SIGIR 1998): the diversity-aware selection every
    // retrieval stack runs AFTER top-k — greedily pick the candidate
    // maximizing λ·sim(q,d) − (1−λ)·max_{s∈Sel} sim(d,s), so near-
    // duplicate hits don't crowd the result window. Exactness: every
    // similarity is the scaled-integer dot over the shared sqrt/divide
    // tree (identical doubles cross-engine), λ = 0.7 as the same
    // literal, ties by vec_id — so the greedy trajectory is fully
    // deterministic. Scale shape: the DISTRIBUTED stage is candidate
    // retrieval (one broadcast-query corpus pass + TakeOrdered top-C);
    // the re-rank is O(C² + C·k) on the bounded C-row window — driver
    // state ≤ C scaled vectors, the production layout (MMR always
    // re-ranks the retrieved window, never the corpus). DuckDB twin:
    // the SAME greedy loop unrolled to MmrK chained CTE selection
    // steps (k is a compile-time constant).
    checked("ann_mmr_rerank", {
      val qid = MmrQueryId
      // Every chained CTE is MATERIALIZED: DuckDB inlines CTEs by
      // default, and sel_i references sel_{i-1} three times — inlining
      // would re-expand the whole candidate/pair subtree 3^k times.
      val steps = (2 to MmrK).map { i =>
        s"""p$i AS MATERIALIZED (SELECT $i AS rank, c.vec_id,
           |    $MmrLam * c.rel - $MmrLamInv * (SELECT max(p.s)
           |      FROM pair p, sel${i - 1} t
           |      WHERE p.ai = c.vec_id AND p.bi = t.vec_id) AS score
           |  FROM cand c
           |  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${i - 1})
           |  ORDER BY score DESC, c.vec_id LIMIT 1),
           |sel$i AS MATERIALIZED (SELECT * FROM sel${i - 1} UNION ALL
           |  SELECT * FROM p$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH sv AS ($svSql),
         |q AS (SELECT v AS qv, n2 AS qn2 FROM sv WHERE vec_id = $qid),
         |scored AS (SELECT vec_id,
         |    ${sqlDotInt("qv", "v", Dim)} / (sqrt(qn2) * sqrt(n2)) AS rel,
         |    v, n2
         |  FROM sv, q WHERE vec_id <> $qid),
         |cand AS MATERIALIZED (SELECT * FROM scored ORDER BY rel DESC, vec_id
         |  LIMIT $MmrCand),
         |pair AS MATERIALIZED (SELECT a.vec_id AS ai, b.vec_id AS bi,
         |    ${sqlDotInt("a.v", "b.v", Dim)} / (sqrt(a.n2) * sqrt(b.n2)) AS s
         |  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
         |p1 AS MATERIALIZED (SELECT 1 AS rank, vec_id, $MmrLam * rel AS score
         |  FROM cand ORDER BY score DESC, vec_id LIMIT 1),
         |sel1 AS MATERIALIZED (SELECT * FROM p1),
         |$steps
         |SELECT CAST(rank AS BIGINT) AS rank, vec_id,
         |  ${graft.functions.DetAgg.sqlR6("score")} AS score
         |FROM sel$MmrK""".stripMargin
    }) { (s, d) =>
      val sv = svSpark(s, d)
      val qRow = sv.filter(col("vec_id") === MmrQueryId)
        .select(col("v"), col("n2")).head()
      val (qv, qn2) = (qRow.getSeq[Long](0).toIndexedSeq, qRow.getDouble(1))
      val qvLit = array(qv.map(lit): _*)
      // Distributed retrieval: one corpus pass, TakeOrdered top-C, then
      // the bounded C-row window (C scaled vectors) to the driver — the
      // same collect contract as the IVF/k-means model state.
      val cand = sv.filter(col("vec_id") =!= MmrQueryId)
        .select(col("vec_id"),
          (dotInt(qvLit, col("v")) / (sqrt(lit(qn2)) * sqrt(col("n2"))))
            .as("rel"),
          col("v"), col("n2"))
        .orderBy(col("rel").desc, col("vec_id"))
        .limit(MmrCand)
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1),
          r.getSeq[Long](2).toIndexedSeq, r.getDouble(3)))
      def simc(a: (Long, Double, IndexedSeq[Long], Double),
               b: (Long, Double, IndexedSeq[Long], Double)): Double = {
        var dot = 0L
        var i = 0
        while (i < Dim) { dot += a._3(i) * b._3(i); i += 1 }
        dot.toDouble / (math.sqrt(a._4) * math.sqrt(b._4))
      }
      // Greedy MMR over the window — the SAME ieee tree and (score
      // DESC, vec_id ASC) tie order as the unrolled SQL.
      val sel = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      val remaining = scala.collection.mutable.ArrayBuffer(cand: _*)
      for (rank <- 1 to MmrK) {
        val scoredStep = remaining.map { c =>
          val score =
            if (rank == 1) MmrLam * c._2
            else {
              val chosen = sel.map(_._2).toSet
              val ms = cand.filter(x => chosen.contains(x._1))
                .map(x => simc(c, x)).max
              MmrLam * c._2 - MmrLamInv * ms
            }
          (c, score)
        }
        val best = scoredStep.minBy { case (c, sc) => (-sc, c._1) }
        sel += ((rank.toLong, best._1._1, best._2))
        remaining -= best._1
      }
      import s.implicits._
      // the RAW score drives the greedy ordering above; the DECLARED
      // score is r6-quantized like every other declared float (ADVICE
      // r9), so bit-equality doesn't rest on ulp-identical sqrt/divide
      // trees across engine versions
      sel.toSeq.toDF("rank", "vec_id", "raw")
        .select(col("rank"), col("vec_id"),
          graft.functions.DetAgg.r6(col("raw")).as("score"))
    })
}
