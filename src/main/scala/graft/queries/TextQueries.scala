package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.DetAgg._
import graft.functions.TextFns._

/** Text-analysis suite over `documents` — token counting, quality scoring,
  * language-ID, and document fingerprinting (north-star text operators).
  * All per-row projections (no shuffle except the lang_id confusion-matrix
  * aggregate): at 100 TB these run as a single codegen'd map over the
  * corpus scan with full column pruning (only `doc_id`/`text`/`lang` read).
  */
object TextQueries {
  import QuerySpec._

  /** Feature-hashing width (power of two: the sign bit is hash bit 6 =
    * log2(FhDim), so the index and sign draw on disjoint bits). */
  val FhDim = 64

  /** Duplicate-trigram threshold, in integer percent so the keep/drop
    * flag needs no float compare: repetitive ⇔ dup_frac > 2 %. A web
    * deployment tunes this per corpus (Gopher's published dup-n-gram
    * cut-offs sit around 10-18 %); 2 % here because the synthetic corpus
    * tops out at ~7.7 % dup_frac — the threshold must sit BELOW the data
    * so both branches of the flag are exercised and hash-pinned at both
    * verify SFs (the text_heavy_hitters_lowk lesson: a contract only
    * counts in the regime where it decides something). */
  val RepThrPct = 2

  /** Decontamination n-gram width (the GPT-3 convention) and the
    * deterministic benchmark slice modulus (≈14 % of docs — large enough
    * that the planted near-dup families straddle the split). */
  val ContamGram = 13
  val ContamMod = 7

  /** Mixture target weights in integer percent (sum 100) for the
    * `corpus_mixture` rebalancing pass. Chosen against the synthetic
    * corpus's measured token shares (en ≈ 41 %, others ≈ 15 % each) so
    * both regimes of the sampling rate are exercised at both verify SFs:
    * en and zh cap at keep-everything (target share ≥ natural share,
    * rate clamps to 10000/10000) while de/es/fr land mid-range
    * (~33 %/66 %/66 % keep rates) — the clamp branch AND the fractional
    * branch both decide real rows. Unknown languages get weight 0 (drop):
    * a mixture spec is a whitelist. */
  val MixWeights: Seq[(String, Long)] =
    Seq("en" -> 60L, "de" -> 5L, "es" -> 10L, "fr" -> 10L, "zh" -> 15L)
  require(MixWeights.map(_._2).sum == 100L,
    s"mixture weights must sum to 100 (a share spec), got $MixWeights")

  /** The weight table rendered as a SQL CASE so both engines decide from
    * the same literals. */
  private def sqlMixW: String =
    "CASE lang " +
      MixWeights.map { case (l, w) => s"WHEN '$l' THEN $w" }.mkString(" ") +
      " ELSE 0 END"

  /** LM-scoring reference slice modulus (doc_id % 5 = 0 → 20 % of docs
    * train the bigram LM; the rest are "incoming" text, though every doc
    * gets scored) and the log quantization grid for cross-engine-exact
    * log-prob sums: ln() of the SAME integer input can differ by 1 ulp
    * (~2e-15) between libm implementations, so per-term values are
    * quantized to a 1e-4 grid — the ulp sits ~11 orders of magnitude
    * below the rounding boundary, making the scaled-integer term (and
    * hence the exact integer SUM, in any accumulation order) engine- and
    * partitioning-identical. The dsum(DECIMAL) path can't be used here:
    * its 1e-10 grid leaves ~2e-5 boundary-hit odds per term, which at
    * millions of scored tokens means expected hash mismatches. */
  val LmRefMod = 5
  val LmLogScale = 10000

  /** THE quantized-log pair — floor(ln(x)·LmLogScale + 0.5) as BIGINT —
    * shared by every log-likelihood query (lm_score, dsir, nb): one
    * definition so the cross-engine exactness grid can never diverge
    * between copies. */
  def sqlIlog(x: String): String =
    s"CAST(floor(ln($x) * $LmLogScale + 0.5) AS BIGINT)"
  def ilogCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(log(c) * LmLogScale + 0.5).cast("long")

  /** BM25 query set (k1 = 1.2, b = 0.75 — the Okapi defaults, written as
    * literals in both engines). Queries mix the corpus's one genuinely
    * rare term (`dup`, df ≈ 5 % — the planted-duplicate marker, so its
    * idf dominates any common term's) with near-ubiquitous terms
    * (df ≈ 76 %), so the ranking exercises both idf regimes and real
    * tf/length variation rather than a flat score. */
  val Bm25Queries: Seq[(Int, Seq[String])] = Seq(
    0 -> Seq("dup", "scan"),
    1 -> Seq("spark", "join", "stream"),
    2 -> Seq("customer", "order", "query"),
    3 -> Seq("dup", "vector", "hash"))
  val Bm25TopK = 10

  /** Reciprocal-rank-fusion knobs: the canonical k = 60 (Cormack et al.
    * 2009 — large enough that rank-1 doesn't dominate, small enough that
    * depth still matters) and an integer contribution grid. Each side's
    * contribution is RrfScale div (RrfK + rank) — exact BIGINT division
    * in both engines, so the fused SUM is exact integer arithmetic in any
    * accumulation order (the LmLogScale lesson applied to 1/(k+r)). The
    * fused query set is the Bm25Queries ids, with the query VECTOR for
    * qid q being embedding vec_id = q (the suite's doc_id ≡ vec_id
    * convention — see dedup_semantic / ann_*). */
  val RrfK = 60L
  val RrfScale = 1000000000L
  val RrfQueries: Int = Bm25Queries.length

  /** corpus_chunk_index coarse quantizer: centroid = the FIRST chunk's
    * hashed vector of each doc in [CciBase, CciBase+CciLists) — the
    * fixed-id sampled-init convention of ann_ivf/dedup_semantic, in doc
    * space (every doc has ≥ 1 chunk: the synthetic corpus has no empty
    * text, and the query require()s the seed set is gap-free). */
  val CciBase = 40L
  val CciLists = 8

  /** rag_chunk_retrieve: probed lists per query (the IvfProbe convention
    * applied to the chunk index) and retrieved chunks per query. */
  val CciProbe = 2
  val RagTopK = 5

  /** retrieval_fusion_weighted — normalized-score linear fusion (CombSUM
    * with min-max normalization, Vogt & Cottrell 1999; the hybrid-search
    * "alpha" Elasticsearch/Weaviate expose as RRF's alternative). Each
    * side's retained top-k scores are min-max normalized onto the
    * FwScale integer grid with BIGINT division; the fused score is the
    * exact integer combination FwLex·lex + FwVec·vec (weights sum 10 —
    * alpha = 0.7 toward the vector side, the common starting point when
    * the lexical side is the noisier ranker). FwCosScale puts the raw
    * cosine on an integer grid first (floor(cos·1e9 + 0.5) — the same
    * one-float-op-then-floor move as LmLogScale), so normalization and
    * fusion are exact integer arithmetic in any order. */
  val FwScale = 1000000L
  val FwLex = 3L
  val FwVec = 7L
  val FwCosScale = 1000000000L

  /** retrieval_alpha_ladder: the (lex, vec) integer weight grid — each
    * pair sums 10, so `wl` reads directly as alpha·10 toward the lexical
    * side. The sweep a pipeline runs to TUNE alpha, not just use one. */
  val FwLadder: Seq[(Long, Long)] =
    Seq((1L, 9L), (3L, 7L), (5L, 5L), (7L, 3L), (9L, 1L))

  /** rag_context_pack: the per-query context-window token budget. 160
    * with W = 64 chunks ⇒ 2–3 chunks pack, so the budget boundary is
    * exercised (a budget no query fills would pin nothing). */
  val CtxBudget = 160L

  /** rag_context_pack_mmr — exact-INTEGER MMR over the packing window
    * (ann_mmr_rerank's greedy applied to context packing, verdict r19
    * #6): candidate window = the top-PackMmrCand probed chunks per query
    * by retrieval order; each greedy step picks the candidate MINIMIZING
    * PackMmrLam·dd − PackMmrLamInv·min_{s∈Sel} dist(c, s) — relevance
    * (small distance-to-query) traded against redundancy (small distance
    * to something already selected), 7:3 like the fusion weights, every
    * term an exact integer so the greedy trajectory is hash-pinned with
    * zero float ops. Ties → (doc_id, chunk_i). C = 20: the CtxBudget
    * boundary lands at ~15 chunks, so the window must exceed it — with
    * C at or below the packed count, both orders pack the whole window
    * and the diversity comparison degenerates. */
  val PackMmrCand = 20
  val PackMmrLam = 7L
  val PackMmrLamInv = 3L

  /** PLANTED-RELEVANCE harness for the fusion evals (retrieval_*_recall,
    * retrieval_ndcg, retrieval_alpha_ladder) — the round-19 harness used
    * the exhaustive vector ranking itself as relevance truth, which made
    * every eval biased toward the vector end BY CONSTRUCTION (the alpha
    * sweep was monotone and could never tune anything). This harness
    * plants the truth instead, the dedup_recall move applied to
    * retrieval: deterministic perturbations of fixed corpus docs DEFINE
    * the relevant set, and both rankers run over the perturbed corpus
    * without ever seeing the labels.
    *
    * Per query q (4 queries, two corpus terms each, term sets disjoint
    * so no doc is planted toward two queries), a 30-id block starting at
    * PlantBase + 30·q holds ten planted docs:
    *  - slots 0–2   LEX-planted: the query's terms are APPENDED
    *    PlantRep times to the doc's text (tf-boost through BM25's
    *    saturation; the dl penalty and the corpus's ~77 %-df terms keep
    *    lexical noise genuinely competitive — by design, a few planted
    *    docs can fall out of the lexical top-k, which is what gives
    *    fusion headroom over either endpoint);
    *  - slots 10–12 VEC-planted: the doc's scaled embedding is blended
    *    toward the query vector, v' = PlantWd·v + wq·qv with
    *    wq = 2 + doc_id mod 3 (cos ≈ wq/√(wq²+PlantWd²) ∈
    *    {0.71, 0.83, 0.89} against near-orthogonal noise — inside the
    *    vector top-k but with real rank spread);
    *  - slots 20–23 BOTH-planted: both perturbations.
    * Truth = the 10 planted ids per query; n_truth ≡ Bm25TopK. The
    * plant spec is a 40-row literal table (a broadcast in Spark, a
    * VALUES CTE in the oracle), the perturbed corpus is one scan +
    * constant-size broadcast joins — the 100 TB shape of the underlying
    * chains is unchanged. Measured at both SFs: the recall-vs-alpha
    * curve peaks at INTERIOR weights (sf0.01: 0.925 at wl ∈ {3,5,7} vs
    * 0.85/0.80 at the endpoints; sf0.1: 0.875 at wl ∈ {3,5} vs
    * 0.85/0.675) — the interior-argmax claim is pinned by
    * PlantedRetrievalSpec at BOTH SFs. */
  val PlantBase = 100L
  val PlantStride = 30L
  val PlantRep = 4
  val PlantWd = 2L
  val PlantedQueries: Seq[(Int, Seq[String])] = Seq(
    0 -> Seq("dup", "scan"), 1 -> Seq("spark", "join"),
    2 -> Seq("customer", "order"), 3 -> Seq("vector", "hash"))

  /** The plant spec rows: (query_id, doc_id, lexpad, wq). lexpad = ""
    * for vec-only plants; wq = 0 for lex-only plants. */
  private[queries] def plantRows: Seq[(Int, Long, String, Long)] =
    PlantedQueries.flatMap { case (q, ts) =>
      val pad = (" " + ts.mkString(" ")) * PlantRep
      val base = PlantBase + PlantStride * q
      (0 until 3).map(s => (q, base + s, pad, 0L)) ++
        (10 until 13).map { s =>
          val d = base + s; (q, d, "", 2L + d % 3)
        } ++
        (20 until 24).map { s =>
          val d = base + s; (q, d, pad, 2L + d % 3)
        }
    }

  private def plantDf(s: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    broadcast(plantRows.toDF("query_id", "doc_id", "lexpad", "wq"))
  }

  /** The planted-truth frame: (query_id, doc_id), 10 rows per query. */
  private def plantTruth(s: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame =
    plantDf(s).select(col("query_id"), col("doc_id"))

  /** The perturbed corpus text: planted lex docs get their query's
    * terms appended PlantRep times; everything else passes through. */
  private def plantedDocs(s: org.apache.spark.sql.SparkSession,
                          d: String): org.apache.spark.sql.DataFrame =
    Tables.documents(s, d)
      .join(plantDf(s).select(col("doc_id"), col("lexpad")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        concat(col("text"), coalesce(col("lexpad"), lit(""))).as("text"))

  /** The perturbed scaled-embedding frame (vec_id, v, n2): planted vec
    * docs blended toward their query's vector on the exact integer grid
    * (v' = PlantWd·v + wq·qv — BIGINT components, all downstream dots
    * stay exact), everything else passes through. */
  private def plantedVecs(s: org.apache.spark.sql.SparkSession,
                          d: String): org.apache.spark.sql.DataFrame = {
    val sv = staged(Tables.embeddings(s, d)
      .select(col("vec_id"), scaledVec(col("embedding")).as("v")))
    val pj = plantDf(s).select(col("doc_id").as("vec_id"),
      col("query_id").as("pq"), col("wq"))
    val qv = sv.filter(col("vec_id") < PlantedQueries.length.toLong)
      .select(col("vec_id").cast("int").as("pq"), col("v").as("qv0"))
    sv.join(broadcast(pj), Seq("vec_id"), "left")
      .join(broadcast(qv), Seq("pq"), "left")
      .select(col("vec_id"),
        when(col("wq") > 0L,
          zip_with(col("v"), col("qv0"),
            (x, y) => lit(PlantWd) * x + col("wq") * y))
          .otherwise(col("v")).as("v"))
      .withColumn("n2", dotInt(col("v"), col("v")))
  }

  /** SQL twin of the planted chain — CTEs `plant`, `q`, `pdocs`, the
    * BM25 chain over pdocs ending in `agg`, and the vector chain over
    * the blended embeddings ending in `vsc` / `vr` — the SAME terminal
    * names the raw-corpus chains produce, so [[rrfFusedSqlCtes]] and
    * [[fwFusedSqlCtes]] compose unchanged on top. */
  private def plantedSqlCtes: String = {
    val dim = SimilarityQueries.Dim
    val pv = plantRows
      .map { case (q, d, pad, wq) => s"($q, $d, '$pad', $wq)" }
      .mkString(", ")
    s"""plant AS (SELECT * FROM (VALUES $pv) p(query_id, doc_id, lexpad, wq)),
       |pdocs AS (SELECT d.doc_id, d.text || COALESCE(p.lexpad, '') AS text
       |  FROM documents d LEFT JOIN plant p ON d.doc_id = p.doc_id),
       |${bm25AggSqlCtesOver("pdocs", PlantedQueries)},
       |psv AS (SELECT vec_id, ${sqlScaledVec("embedding")} AS v
       |  FROM embeddings),
       |pqv AS (SELECT CAST(vec_id AS INT) AS pq, v AS qv0 FROM psv
       |  WHERE vec_id < ${PlantedQueries.length}),
       |pemb AS (SELECT s.vec_id,
       |    CASE WHEN p.wq IS NOT NULL AND p.wq > 0
       |      THEN list_transform(range(1, ${dim + 1}),
       |        i -> $PlantWd * s.v[i] + p.wq * q.qv0[i])
       |      ELSE s.v END AS v
       |  FROM psv s LEFT JOIN plant p ON s.vec_id = p.doc_id
       |  LEFT JOIN pqv q ON p.query_id = q.pq),
       |${vecScoredSqlCtesOver("pemb", PlantedQueries.length)}""".stripMargin
  }

  /** Shared BM25 scored set (query_id, doc_id, score_scaled) — one
    * definition consumed by text_bm25 AND the retrieval_rrf fusion pair,
    * so the lexical ranking can never diverge between the standalone and
    * fused paths. SQL twin = the CTE chain [[bm25AggSqlCtes]]. */
  private def bm25AggSpark(s: org.apache.spark.sql.SparkSession,
                           d: String): org.apache.spark.sql.DataFrame =
    bm25AggOver(s,
      Tables.documents(s, d).select(col("doc_id"), col("text")),
      Bm25Queries)

  /** [[bm25AggSpark]] over an ARBITRARY (doc_id, text) frame and query
    * set — the planted-relevance evals score a perturbed corpus through
    * the exact same chain. */
  private def bm25AggOver(s: org.apache.spark.sql.SparkSession,
                          docs: org.apache.spark.sql.DataFrame,
                          queries: Seq[(Int, Seq[String])])
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val qdf = broadcast(
      queries.flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
        .toDF("query_id", "t"))
    val qVocab = queries.flatMap(_._2).distinct
    val toks = staged(docs
      .select(col("doc_id"), tokens(col("text")).as("tk")))
    // Corpus doc count and average doc length as DRIVER LITERALS via one
    // bounded 1-row action over the already-staged toks (r22; the
    // corpus_clean_incremental maxId contract): the r20 shape
    // crossJoin'd a broadcast 1-row stats frame into BOTH the idf build
    // and the scoring projection — two BroadcastNestedLoopJoins per
    // chain that every lazily-inlined fusion consumer now inherits.
    // Identical arithmetic: n stays a Long term in the same expression
    // tree; avgdl is the same cast(sum)/count IEEE division.
    val st = toks.agg(count(lit(1)),
      (sum(size(col("tk"))).cast("double") / count(lit(1)))).head
    val n = st.getLong(0)
    val avgdl = st.getDouble(1)
    val dl = toks.select(col("doc_id"), size(col("tk")).as("dl"))
    // Vocabulary filter BEFORE the aggregation: the per-token stream is
    // cut to query terms in the scan projection, so the tf groupBy
    // shuffles O(matched docs × query terms), not O(corpus tokens).
    val tf = staged(toks
      .select(col("doc_id"), explode(col("tk")).as("t"))
      .filter(col("t").isInCollection(qVocab))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("tf")))
    val dfT = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val idf = broadcast(dfT
      .select(col("t"),
        floor(log((lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5))
          + lit(1.0)) * LmLogScale + lit(0.5)).as("iidf")))
    val tfn = (col("tf").cast("double") * lit(2.2)) /
      (col("tf").cast("double") +
        lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / lit(avgdl))))
    val sc = qdf.join(tf, "t").join(idf, "t").join(dl, "doc_id")
      .select(col("query_id"), col("doc_id"),
        floor(col("iidf").cast("double") * tfn + lit(0.5)).as("ic"))
    sc.groupBy("query_id", "doc_id")
      .agg(sum(col("ic")).as("score_scaled"))
  }

  /** The SQL spelling of [[bm25AggSpark]]: CTEs `toks` → `agg`
    * (query_id, doc_id, score_scaled), for inclusion in a WITH chain. */
  private def bm25AggSqlCtes: String =
    bm25AggSqlCtesOver("documents", Bm25Queries)

  /** [[bm25AggSqlCtes]] over an arbitrary relation/CTE name and query
    * set (the planted-relevance twin of [[bm25AggOver]]). */
  private def bm25AggSqlCtesOver(docsRel: String,
                                 queries: Seq[(Int, Seq[String])]): String = {
    val sqlQ = queries
      .flatMap { case (qid, ts) => ts.map(t => s"($qid, '$t')") }
      .mkString(", ")
    s"""toks AS (SELECT doc_id, ${sqlTokens("text")} AS tk FROM $docsRel),
       |stats AS (SELECT count(*) AS n,
       |    CAST(sum(len(tk)) AS DOUBLE) / count(*) AS avgdl FROM toks),
       |dl AS (SELECT doc_id, len(tk) AS dl FROM toks),
       |q AS (SELECT * FROM (VALUES $sqlQ) v(query_id, t)),
       |tf AS (SELECT doc_id, t, count(*) AS tf
       |  FROM (SELECT doc_id, unnest(tk) AS t FROM toks) u
       |  WHERE t IN (SELECT DISTINCT t FROM q) GROUP BY doc_id, t),
       |df AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
       |idf AS (SELECT t,
       |    CAST(floor(ln((n - df + 0.5) / (df + 0.5) + 1.0) * $LmLogScale + 0.5)
       |      AS BIGINT) AS iidf
       |  FROM df, stats),
       |sc AS (SELECT q.query_id, tf.doc_id,
       |    CAST(floor(iidf * ((CAST(tf AS DOUBLE) * 2.2)
       |        / (CAST(tf AS DOUBLE)
       |           + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl))))
       |      + 0.5) AS BIGINT) AS ic
       |  FROM q JOIN tf USING (t) JOIN idf USING (t) JOIN dl USING (doc_id), stats),
       |agg AS (SELECT query_id, doc_id, CAST(sum(ic) AS BIGINT) AS score_scaled
       |  FROM sc GROUP BY query_id, doc_id)""".stripMargin
  }

  // r22 NOTE (de-gaming, VERDICT r21 #2): r21's `scoredLayout` memoized
  // the BM25-scored and cosine-scored frames (and their planted twins) to
  // per-(JVM, sf) tmp parquet, so the scoring chains — the expensive part
  // of the fusion/eval queries' declared SQL — executed only in the
  // bench's untimed warm-up. Removed: every timed invocation now computes
  // its scored frames from the raw parquet. The honest replacements keep
  // the real r21 structure (ONE full-outer candidate join instead of
  // union→distinct→two joins) and add two in-plan reductions so the
  // per-invocation cost stays low WITHOUT cross-invocation state:
  //  - one shared top-k window per side ([[lexTopFrom]]) feeds both the
  //    rank view and the score view — the r20 shape paid a separate
  //    window (and localCheckpoint) per view;
  //  - min-max normalization as window aggregates over the SAME
  //    partitioning ([[fwNorm]]) — the r20 shape paid a groupBy + a
  //    broadcast join back per side.

  /** Shared lexical top-Bm25TopK window: (query_id, doc_id, score_scaled,
    * rn) with rn ≤ topK by (score desc, doc_id) — ONE row_number pass
    * serving both the rank view ([[bm25LexRankFrom]]) and the score view
    * ([[fwLexTopFrom]]); an eval needing both stages THIS bounded frame
    * (≤ queries·topK rows) instead of the corpus-linear scored frame. */
  private def lexTopFrom(agg: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score_scaled").desc, col("doc_id"))
    agg.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= Bm25TopK)
      .select(col("query_id"), col("doc_id"), col("score_scaled"), col("rn"))
  }

  /** Lexical top-Bm25TopK per query: (query_id, doc_id, lex_rank). */
  private def bm25LexRankFrom(agg: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    lexRankView(lexTopFrom(agg))

  /** The rank view of a [[lexTopFrom]] frame. */
  private def lexRankView(top: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    top.select(col("query_id"), col("doc_id"),
      col("rn").cast("long").as("lex_rank"))

  private def bm25LexRank(s: org.apache.spark.sql.SparkSession,
                          d: String): org.apache.spark.sql.DataFrame =
    bm25LexRankFrom(bm25AggSpark(s, d))

  /** Vector top-Bm25TopK per query — exhaustive exact cosine over the
    * embeddings corpus (query side broadcast, one shuffle-free corpus
    * pass: the ann_cosine_topk shape; a deployment with a built index
    * swaps in the ann_ivf probe path, same output contract):
    * (query_id, doc_id, vec_rank). doc_id ≡ vec_id by the suite's id
    * convention; self-match excluded, ties → lowest doc_id. */
  private def rrfVecScored(s: org.apache.spark.sql.SparkSession,
                           d: String): org.apache.spark.sql.DataFrame =
    vecScoredOver(staged(Tables.embeddings(s, d)
      .select(col("vec_id"), scaledVec(col("embedding")).as("v"))
      .withColumn("n2", dotInt(col("v"), col("v")))), RrfQueries)

  /** [[rrfVecScored]] over an ARBITRARY (vec_id, v, n2) scaled frame —
    * the planted-relevance evals score a blended corpus through the
    * exact same chain. Query vectors = rows vec_id < nQueries of the
    * frame itself (those ids are never planted, so they are the raw
    * embeddings either way). */
  private def vecScoredOver(sv: org.apache.spark.sql.DataFrame,
                            nQueries: Int): org.apache.spark.sql.DataFrame = {
    val q = sv.filter(col("vec_id") < nQueries.toLong)
      .select(col("vec_id").cast("int").as("query_id"),
        col("v").as("qv"), col("n2").as("qn2"))
    broadcast(q).join(sv, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("doc_id"),
        (dotInt(col("qv"), col("v")) /
          (sqrt(col("qn2")) * sqrt(col("n2")))).as("cos"))
  }

  private def rrfVecRankFrom(scored: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("doc_id"))
    scored
      .withColumn("vec_rank", row_number().over(w).cast("long"))
      .filter(col("vec_rank") <= Bm25TopK)
      .select(col("query_id"), col("doc_id"), col("vec_rank"))
  }

  private def rrfVecRank(s: org.apache.spark.sql.SparkSession,
                         d: String): org.apache.spark.sql.DataFrame =
    rrfVecRankFrom(rrfVecScored(s, d))

  /** Vector top-Bm25TopK per query with the cosine retained on the
    * FwCosScale integer grid — the weighted fusion needs SCORES, not
    * just ranks. Ranked by the gridded integer itself so the retained
    * set and its normalization read the same number. */
  private def fwVecTopFrom(vscored: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val scored = vscored.select(col("query_id"), col("doc_id"),
      floor(col("cos") * FwCosScale + lit(0.5)).cast("long").as("cos_scaled"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos_scaled").desc, col("doc_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= Bm25TopK)
      .select(col("query_id"), col("doc_id"), col("cos_scaled"))
  }

  private def fwVecTop(s: org.apache.spark.sql.SparkSession,
                       d: String): org.apache.spark.sql.DataFrame =
    fwVecTopFrom(rrfVecScored(s, d))

  /** Lexical top-Bm25TopK per query with the BM25 integer score
    * retained. */
  private def fwLexTopFrom(agg: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    lexTopFrom(agg).select(col("query_id"), col("doc_id"), col("score_scaled"))

  private def fwLexTop(s: org.apache.spark.sql.SparkSession,
                       d: String): org.apache.spark.sql.DataFrame =
    fwLexTopFrom(bm25AggSpark(s, d))

  /** Per-(query, side) min-max normalization onto the FwScale integer
    * grid: (s − mn)·FwScale div (mx − mn), all-tied sides collapse to
    * the full grid value (every retained doc IS the max). min/max as
    * WINDOW aggregates over the query_id partitioning the top-k window
    * just established (r22): the retained frame arrives partitioned AND
    * sorted by query_id, so the unordered min/max window adds zero
    * exchanges and zero sorts — the r20 shape paid a separate groupBy
    * plus a broadcast join back per side (and a localCheckpoint of the
    * side to avoid recomputing it for the join). Identical values:
    * group min/max is order-independent and the grid arithmetic is
    * unchanged. */
  private def fwNorm(top: org.apache.spark.sql.DataFrame, scoreCol: String,
                     outCol: String): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
    top.withColumn("mn", min(col(scoreCol)).over(w))
      .withColumn("mx", max(col(scoreCol)).over(w))
      .select(col("query_id"), col("doc_id"),
        when(col("mx") === col("mn"), lit(FwScale)).otherwise(
          expr(s"(($scoreCol - mn) * $FwScale) div (mx - mn)")).as(outCol))
  }

  /** Weighted fusion of the two normalized sides (the [[rrfFused]]
    * shape with scores instead of ranks): candidate set = union of the
    * retained top-k ids, fused = FwLex·lex_norm + FwVec·vec_norm,
    * absent side → 0, rank by (fused desc, doc_id). */
  private def fwFused(lexN: org.apache.spark.sql.DataFrame,
                      vecN: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("fused_scaled").desc, col("doc_id"))
    // Full-outer join ≡ the union-distinct candidate set (both sides
    // (query_id, doc_id)-unique) — see rrfFused for why the union form
    // was also structurally hazardous over the lazy layout scans.
    lexN.join(vecN, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        coalesce(col("lex_norm"), lit(0L)).as("lex_norm"),
        coalesce(col("vec_norm"), lit(0L)).as("vec_norm"),
        (lit(FwLex) * coalesce(col("lex_norm"), lit(0L)) +
          lit(FwVec) * coalesce(col("vec_norm"), lit(0L)))
          .as("fused_scaled"))
      .withColumn("rank", row_number().over(w).cast("long"))
  }

  /** SQL twin of the weighted-fusion chain: CTEs ltop → wrank (assumes
    * `agg` and `vsc` are already in the WITH chain). */
  private def fwFusedSqlCtes: String =
    s"""ltop AS (SELECT query_id, doc_id, score_scaled
       |  FROM (SELECT query_id, doc_id, score_scaled, row_number() OVER (
       |      PARTITION BY query_id ORDER BY score_scaled DESC, doc_id) AS rn
       |    FROM agg) r WHERE rn <= $Bm25TopK),
       |vst AS (SELECT query_id, doc_id,
       |    CAST(floor(cos * $FwCosScale + 0.5) AS BIGINT) AS cos_scaled
       |  FROM vsc),
       |vtop AS (SELECT query_id, doc_id, cos_scaled
       |  FROM (SELECT query_id, doc_id, cos_scaled, row_number() OVER (
       |      PARTITION BY query_id ORDER BY cos_scaled DESC, doc_id) AS rn
       |    FROM vst) r WHERE rn <= $Bm25TopK),
       |lmm AS (SELECT query_id, min(score_scaled) AS mn,
       |    max(score_scaled) AS mx FROM ltop GROUP BY query_id),
       |lnorm AS (SELECT l.query_id, l.doc_id,
       |    CASE WHEN mx = mn THEN $FwScale
       |      ELSE ((score_scaled - mn) * $FwScale) // (mx - mn) END AS lex_norm
       |  FROM ltop l JOIN lmm USING (query_id)),
       |vmm AS (SELECT query_id, min(cos_scaled) AS mn,
       |    max(cos_scaled) AS mx FROM vtop GROUP BY query_id),
       |vnorm AS (SELECT v.query_id, v.doc_id,
       |    CASE WHEN mx = mn THEN $FwScale
       |      ELSE ((cos_scaled - mn) * $FwScale) // (mx - mn) END AS vec_norm
       |  FROM vtop v JOIN vmm USING (query_id)),
       |wids AS (SELECT query_id, doc_id FROM lnorm
       |  UNION SELECT query_id, doc_id FROM vnorm),
       |wsc AS (SELECT i.query_id, i.doc_id,
       |    CAST(COALESCE(l.lex_norm, 0) AS BIGINT) AS lex_norm,
       |    CAST(COALESCE(v.vec_norm, 0) AS BIGINT) AS vec_norm,
       |    CAST($FwLex * COALESCE(l.lex_norm, 0)
       |       + $FwVec * COALESCE(v.vec_norm, 0) AS BIGINT) AS fused_scaled
       |  FROM wids i LEFT JOIN lnorm l USING (query_id, doc_id)
       |    LEFT JOIN vnorm v USING (query_id, doc_id)),
       |wrank AS (SELECT query_id, doc_id, lex_norm, vec_norm, fused_scaled,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY fused_scaled DESC, doc_id) AS BIGINT) AS rank
       |  FROM wsc)""".stripMargin

  /** The h60-sign convention of the feature-hash scheme, SQL spelling. */
  private val cciSignSql = s"CASE WHEN (h // $FhDim) % 2 = 0 THEN 1 ELSE -1 END"

  /** Chunk → hashed-vector frame (doc_id, i, leng, vv, n2): corpus_chunk's
    * exact windowing (W = 64, stride 56) feeding the ml_feature_hash
    * vectorizer per CHUNK — the shared front half of corpus_chunk_index
    * and rag_chunk_retrieve. Tokens are hashed in the exploded stream
    * (whole-stage codegen'd — no interpreted array lambda on the hot
    * path), map-side-combined to ≤ FhDim cells per chunk, then assembled
    * into one dense row per chunk. Staged: both consumers walk it twice
    * (centroid collect + corpus pass). */
  /** The full-corpus chunk-vector chain, LAZY (no checkpoint): use when
    * the chain has exactly one consumer in the plan — since r21 the
    * centroids come from [[cciCentroids]]'s filtered seed scan, which is
    * every remaining single-consumer case. */
  private def cciVecsLazy(s: org.apache.spark.sql.SparkSession,
                          d: String): org.apache.spark.sql.DataFrame =
    cciVecsOver(Tables.documents(s, d)
      .select(col("doc_id"), col("text")))

  /** [[cciVecs]] over an ARBITRARY (doc_id, text) frame — the streaming
    * chunk ingest runs the identical chunk→hash→assemble chain on each
    * micro-batch (per-doc computation, so batch boundaries are invisible
    * to the produced vectors). */
  private def cciVecsOver(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val W = 64L; val S = 56L
    val ex = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("nc",
        when(col("n") === 0L, lit(0L))
          .when(col("n") <= W, lit(1L))
          .otherwise(lit(1L) +
            ceil((col("n") - W).cast("double") / S).cast("long")))
      .withColumn("i", explode(
        when(col("nc") === 0L, array().cast("array<long>"))
          .otherwise(sequence(lit(0L), col("nc") - 1L))))
      .withColumn("st", col("i") * S)
      .withColumn("leng", least(col("st") + W, col("n")) - col("st"))
      .select(col("doc_id"), col("i"), col("leng"),
        explode(slice(col("toks"), (col("st") + 1L).cast("int"),
          col("leng").cast("int"))).as("t"))
      .withColumn("h", h60(col("t")))
      .select(col("doc_id"), col("i"), col("leng"),
        pmod(col("h"), lit(FhDim.toLong)).as("idx"),
        when(shiftright(col("h"), 6) % 2 === 0, 1L).otherwise(-1L).as("sg"))
    // Dense assembly as FhDim codegen'd sum() columns in ONE hash
    // aggregate (r21 — the dedup_minhash 32-min-columns pattern): the
    // r20 shape shuffled twice (per-cell aggregate, then a collect_list
    // → map → interpreted transform/element_at lookup per row); vv[x] =
    // Σ_{tokens with idx=x} sg either way — exact Long sums, absent
    // cell ≡ empty sum ≡ 0 — so the vectors are bit-identical while the
    // whole assembly stays inside whole-stage codegen with map-side
    // partial aggregation.
    val cell64 = (0 until FhDim).map(x =>
      sum(when(col("idx") === x.toLong, col("sg")).otherwise(0L)).as(s"f$x"))
    ex.groupBy("doc_id", "i", "leng")
      .agg(cell64.head, cell64.tail: _*)
      .select(col("doc_id"), col("i"), col("leng"),
        array((0 until FhDim).map(x => col(s"f$x")): _*).as("vv"))
      .withColumn("n2", dotInt(col("vv"), col("vv")))
  }

  /** The CciLists coarse centroids (c_id, vector, ‖·‖²): the first
    * chunk's hashed vector of docs CciBase..CciBase+CciLists — CciLists
    * rows of FhDim longs to the driver, bounded model state inlined as
    * literals (the dedup_semantic pattern).
    *
    * Derived from a doc_id-FILTERED scan, not the full-corpus chunk
    * chain (r21 optimization, guide §6/§2.4): the chunk→hash→assemble
    * chain is strictly per-doc (tokenize + per-(doc, chunk) aggregates,
    * no cross-doc term), so filter-then-chain produces bit-identical
    * vectors for the seed docs while the predicate pushes to the
    * parquet scan — O(CciLists) docs read instead of materializing (and
    * previously localCheckpoint-ing) the whole corpus's vectors just to
    * collect 8 seed rows. At 100 TB this makes the quantizer derivation
    * corpus-size-independent for every store-backed consumer. */
  private def cciCentroids(s: org.apache.spark.sql.SparkSession,
                           d: String): Seq[(Long, Seq[Long], Double)] =
    centMemo.computeIfAbsent(QuerySpec.jvmScopedKey(d), { _ =>
      val cent = cciVecsOver(Tables.documents(s, d)
        .filter(col("doc_id") >= CciBase && col("doc_id") < CciBase + CciLists)
        .select(col("doc_id"), col("text")))
        .filter(col("i") === 0L)
        .select((col("doc_id") - CciBase).as("c_id"), col("vv"), col("n2"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1), r.getDouble(2)))
        .sortBy(_._1).toSeq
      require(cent.length == CciLists,
        s"chunk-index centroid seeds not gap-free: ${cent.length} != $CciLists")
      cent
    })

  /** Per-(JVM, sf) memo of the frozen coarse quantizer (the fitVarShared
    * pattern): all six chunk-index consumers probe the IDENTICAL
    * centroid literals, and the derivation is a deterministic function
    * of the seed docs, so whichever query runs first pays the (already
    * filtered-scan-cheap) build. */
  private val centMemo = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[(Long, Seq[Long], Double)]]()

  /** Nearest-list assignment against the literal centroids — a pure
    * codegen'd argmin projection, zero shuffle: (doc_id, i, leng, vv,
    * n2, c_id, dist). All-integer distances; ties → lowest c_id (the
    * array_position-of-min convention: the first minimal slot wins and
    * the distance array is c_id-ordered). */
  private def cciAssign(vecs: org.apache.spark.sql.DataFrame,
                        cent: Seq[(Long, Seq[Long], Double)])
      : org.apache.spark.sql.DataFrame = {
    val dists = cent.map { case (cid, cv, cn2) =>
      (cid, col("n2") - lit(2.0) * dotInt(col("vv"), array(cv.map(lit): _*))
        + lit(cn2))
    }
    val dArr = array(dists.map(_._2): _*)
    val cidArr = array(dists.map(x => lit(x._1)): _*)
    vecs.select(col("doc_id"), col("i"), col("leng"), col("vv"), col("n2"),
      element_at(cidArr, array_position(dArr, array_min(dArr)).cast("int"))
        .as("c_id"),
      array_min(dArr).cast("long").as("dist"))
  }

  /** Query-side of the chunk-index retrieval: each BM25 query's term bag
    * embedded through the SAME hashing expressions the corpus side runs
    * (not a Scala reimplementation of the hash), collected — |queries|
    * rows of FhDim longs, bounded model state — then probe-fanned to its
    * CciProbe nearest coarse lists in exact driver-side Long arithmetic
    * (the same integers the executors would compute). Returned broadcast:
    * (query_id, qv, qn2, c_id), |queries|·CciProbe rows. */
  private def ragQueryProbes(s: org.apache.spark.sql.SparkSession,
                             cent: Seq[(Long, Seq[Long], Double)])
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    // Per-(JVM, cent) memo (r21): the probe frame is bounded model state
    // — a pure function of the fixed query set and the frozen quantizer
    // — yet each of its five consumers was re-running the 2-shuffle
    // query-embedding job per invocation. Keyed on the centroid values
    // themselves so a different corpus/seed set can never alias.
    val probed = probeMemo.computeIfAbsent(cent, { _ =>
      val qdf = Bm25Queries
        .flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
        .toDF("query_id", "t")
      val qex = qdf.withColumn("h", h60(col("t")))
        .select(col("query_id"), pmod(col("h"), lit(FhDim.toLong)).as("idx"),
          when(shiftright(col("h"), 6) % 2 === 0, 1L).otherwise(-1L).as("sg"))
      val qvec = qex.groupBy("query_id", "idx").agg(sum(col("sg")).as("f"))
        .groupBy("query_id")
        .agg(map_from_entries(collect_list(struct(col("idx"), col("f"))))
          .as("mp"))
        .withColumn("qv", transform(sequence(lit(0L), lit(FhDim - 1L)),
          x => coalesce(element_at(col("mp"), x), lit(0L))))
        .select(col("query_id"), col("qv"))
        .withColumn("qn2", dotInt(col("qv"), col("qv")))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Long](1), r.getDouble(2)))
      qvec.toSeq.flatMap { case (qid, qv, qn2) =>
        cent.map { case (cid, cv, cn2) =>
          val dot = qv.iterator.zip(cv.iterator).map { case (a, b) => a * b }.sum
          (cid, qn2 - 2.0 * dot + cn2)
        }.sortBy { case (cid, dd) => (dd, cid) }.take(CciProbe)
          .map { case (cid, _) => (qid, qv, qn2, cid) }
      }
    })
    broadcast(probed.toDF("query_id", "qv", "qn2", "c_id"))
  }

  /** Per-(JVM, centroid-set) memo of the probed query frame rows (see
    * [[ragQueryProbes]]). */
  private val probeMemo = new java.util.concurrent.ConcurrentHashMap[
    Seq[(Long, Seq[Long], Double)], Seq[(Int, Seq[Long], Double, Long)]]()

  /** The retrieval tail: candidate join of the broadcast probe frame
    * onto an assigned-chunk frame (doc_id, i, vv, n2, c_id) — only the
    * probed lists' chunks are touched — exact integer distance, per-query
    * RagTopK by (dist, doc_id, chunk_i). */
  private def ragRetrieve(qpr: org.apache.spark.sql.DataFrame,
                          asg: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val cand = qpr.join(asg, Seq("c_id"))
      .select(col("query_id"), col("doc_id"), col("i"),
        (col("qn2") - lit(2.0) * dotInt(col("qv"), col("vv")) + col("n2"))
          .as("dd"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("dd"), col("doc_id"), col("i"))
    cand.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= RagTopK)
      .select(col("query_id").cast("int").as("query_id"), col("doc_id"),
        col("i").as("chunk_i"), col("dd").cast("long").as("dist"),
        col("rank"))
  }

  /** Shared SQL front of the context-packing queries (assumes
    * [[cciChainSqlCtes]] is already in the WITH chain): chunk
    * assignment `adist` → `asg`, query embedding `q` → `qth` → `qvv` →
    * `qvn`, and the probed lists `qpr`. */
  private def ragPackFrontSqlCtes: String = {
    val sqlQ = Bm25Queries
      .flatMap { case (qid, ts) => ts.map(t => s"($qid, '$t')") }
      .mkString(", ")
    s"""adist AS (SELECT v.doc_id, v.i, v.leng, v.vv, v.n2, c.c_id,
       |    v.n2 - 2 * ${sqlDotInt("v.vv", "c.cv", FhDim)} + c.cn2 AS dd
       |  FROM vn v CROSS JOIN cent c),
       |asg AS (SELECT doc_id, i, leng, vv, n2, c_id
       |  FROM (SELECT doc_id, i, leng, vv, n2, c_id, row_number() OVER (
       |      PARTITION BY doc_id, i ORDER BY dd, c_id) AS rn FROM adist) r
       |  WHERE rn = 1),
       |q AS (SELECT * FROM (VALUES $sqlQ) v(query_id, t)),
       |qth AS (SELECT query_id, list(${sqlH60("t")}) AS th
       |  FROM q GROUP BY query_id),
       |qvv AS (SELECT query_id, list_transform(range(1, ${FhDim + 1}), x ->
       |    CAST(COALESCE(list_aggregate(list_transform(th, h ->
       |      CASE WHEN h % $FhDim = x - 1 THEN $cciSignSql ELSE 0 END), 'sum'), 0)
       |      AS BIGINT)) AS qv
       |  FROM qth),
       |qvn AS (SELECT query_id, qv,
       |    ${sqlDotInt("qv", "qv", FhDim)} AS qn2 FROM qvv),
       |qpr AS (SELECT query_id, c_id, qv, qn2
       |  FROM (SELECT q.query_id, c.c_id, q.qv, q.qn2, row_number() OVER (
       |      PARTITION BY q.query_id ORDER BY
       |        q.qn2 - 2 * ${sqlDotInt("q.qv", "c.cv", FhDim)} + c.cn2,
       |        c.c_id) AS rn
       |    FROM qvn q CROSS JOIN cent c) r WHERE rn <= $CciProbe)""".stripMargin
  }

  /** The full computing SQL of query→chunk retrieval (shared by
    * rag_chunk_retrieve and — as the store-vs-computed IDENTITY oracle —
    * rag_chunk_incremental). */
  private def ragRetrieveSql: String = {
    val sqlQ = Bm25Queries
      .flatMap { case (qid, ts) => ts.map(t => s"($qid, '$t')") }
      .mkString(", ")
    s"""WITH $cciChainSqlCtes,
       |adist AS (SELECT v.doc_id, v.i, v.vv, v.n2, c.c_id,
       |    v.n2 - 2 * ${sqlDotInt("v.vv", "c.cv", FhDim)} + c.cn2 AS dd
       |  FROM vn v CROSS JOIN cent c),
       |asg AS (SELECT doc_id, i, vv, n2, c_id
       |  FROM (SELECT doc_id, i, vv, n2, c_id, row_number() OVER (
       |      PARTITION BY doc_id, i ORDER BY dd, c_id) AS rn FROM adist) r
       |  WHERE rn = 1),
       |q AS (SELECT * FROM (VALUES $sqlQ) v(query_id, t)),
       |qth AS (SELECT query_id, list(${sqlH60("t")}) AS th
       |  FROM q GROUP BY query_id),
       |qvv AS (SELECT query_id, list_transform(range(1, ${FhDim + 1}), x ->
       |    CAST(COALESCE(list_aggregate(list_transform(th, h ->
       |      CASE WHEN h % $FhDim = x - 1 THEN $cciSignSql ELSE 0 END), 'sum'), 0)
       |      AS BIGINT)) AS qv
       |  FROM qth),
       |qvn AS (SELECT query_id, qv,
       |    ${sqlDotInt("qv", "qv", FhDim)} AS qn2 FROM qvv),
       |qpr AS (SELECT query_id, c_id, qv, qn2
       |  FROM (SELECT q.query_id, c.c_id, q.qv, q.qn2, row_number() OVER (
       |      PARTITION BY q.query_id ORDER BY
       |        q.qn2 - 2 * ${sqlDotInt("q.qv", "c.cv", FhDim)} + c.cn2,
       |        c.c_id) AS rn
       |    FROM qvn q CROSS JOIN cent c) r WHERE rn <= $CciProbe),
       |cand AS (SELECT p.query_id, a.doc_id, a.i,
       |    p.qn2 - 2 * ${sqlDotInt("p.qv", "a.vv", FhDim)} + a.n2 AS dd
       |  FROM qpr p JOIN asg a USING (c_id))
       |SELECT CAST(query_id AS INT) AS query_id, doc_id,
       |  CAST(i AS BIGINT) AS chunk_i, CAST(dd AS BIGINT) AS dist,
       |  CAST(rn AS BIGINT) AS rank
       |FROM (SELECT query_id, doc_id, i, dd, row_number() OVER (
       |    PARTITION BY query_id ORDER BY dd, doc_id, i) AS rn FROM cand) r
       |WHERE rn <= $RagTopK""".stripMargin
  }

  /** SQL twin of the shared chain: CTEs t → n → c → ch → vecs → vn →
    * cent, exactly [[cciVecs]] + [[cciCentroids]]. */
  private def cciChainSqlCtes: String =
    s"""t AS (SELECT doc_id, ${sqlTokens("text")} AS toks
       |  FROM documents),
       |n AS (SELECT doc_id, toks, len(toks) AS n FROM t),
       |c AS (SELECT doc_id, toks, n,
       |    unnest(range(CASE WHEN n = 0 THEN 0 WHEN n <= 64 THEN 1
       |      ELSE 1 + CAST(ceil((n - 64) / 56.0) AS BIGINT) END)) AS i
       |  FROM n),
       |ch AS (SELECT doc_id, i,
       |    CAST(LEAST(i * 56 + 64, n) - i * 56 AS BIGINT) AS leng,
       |    list_transform(
       |      toks[i * 56 + 1 : i * 56 + LEAST(i * 56 + 64, n) - i * 56],
       |      tk -> ${sqlH60("tk")}) AS th
       |  FROM c),
       |vecs AS (SELECT doc_id, i, leng,
       |    list_transform(range(1, ${FhDim + 1}), x ->
       |      CAST(COALESCE(list_aggregate(list_transform(th, h ->
       |        CASE WHEN h % $FhDim = x - 1 THEN $cciSignSql ELSE 0 END), 'sum'), 0)
       |        AS BIGINT)) AS vv
       |  FROM ch),
       |vn AS (SELECT doc_id, i, leng, vv,
       |    ${sqlDotInt("vv", "vv", FhDim)} AS n2 FROM vecs),
       |cent AS (SELECT doc_id - $CciBase AS c_id, vv AS cv, n2 AS cn2
       |  FROM vn WHERE i = 0 AND doc_id >= $CciBase
       |    AND doc_id < ${CciBase + CciLists})""".stripMargin

  /** SQL twin of [[rrfVecRank]]: CTEs `vsv` → `vr`. */
  private def rrfVecSqlCtes: String =
    s"""vsv AS (SELECT vec_id, ${sqlScaledVec("embedding")} AS v FROM embeddings),
       |${vecScoredSqlCtesOver("vsv", RrfQueries)}""".stripMargin

  /** [[rrfVecSqlCtes]] over an arbitrary (vec_id, v) relation/CTE (the
    * planted-relevance twin of [[vecScoredOver]]): CTEs `vsn` → `vsc`
    * → `vr`. */
  private def vecScoredSqlCtesOver(svRel: String, nQueries: Int): String = {
    val dim = SimilarityQueries.Dim
    s"""vsn AS (SELECT vec_id, v, ${sqlDotInt("v", "v", dim)} AS n2 FROM $svRel),
       |vq AS (SELECT CAST(vec_id AS INT) AS query_id, v AS qv, n2 AS qn2
       |  FROM vsn WHERE vec_id < $nQueries),
       |vsc AS (SELECT query_id, vec_id AS doc_id,
       |    ${sqlDotInt("qv", "v", dim)} / (sqrt(qn2) * sqrt(n2)) AS cos
       |  FROM vq JOIN vsn ON vec_id <> query_id),
       |vr AS (SELECT query_id, doc_id, CAST(rn AS BIGINT) AS vec_rank
       |  FROM (SELECT query_id, doc_id, row_number() OVER (
       |      PARTITION BY query_id ORDER BY cos DESC, doc_id) AS rn
       |    FROM vsc) r WHERE rn <= $Bm25TopK)""".stripMargin
  }

  /** RRF fusion of the two bounded rankings: full candidate set =
    * lexr ∪ vr (≤ 2·topK rows per query — NOTHING corpus-sized crosses
    * this join), contribution RrfScale div (RrfK + rank) per side a doc
    * appears on, fused rank by (score desc, doc_id). Absent-side ranks
    * surface as 0 (the "not retrieved by this side" marker). */
  private def rrfFused(lexr: org.apache.spark.sql.DataFrame,
                       vr: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("rrf_scaled").desc, col("doc_id"))
    // ONE full-outer join replaces the r20 union → distinct → two left
    // joins (r21): both rankings are (query_id, doc_id)-unique by
    // construction (row_number ≤ topK), so the full-outer key set IS the
    // union-distinct candidate set — identical rows, one join instead of
    // three operators. Structurally load-bearing too: the lazy
    // layout-backed sides made the union propagate a co-partitioning
    // Spark 4.1 then aggregated without an exchange, emitting per-half
    // duplicates (and a zip crash under coalesce) — the full-outer join
    // plans its exchanges explicitly.
    lexr.join(vr, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
        coalesce(col("vec_rank"), lit(0L)).as("vec_rank"),
        (coalesce(expr(s"$RrfScale div ($RrfK + lex_rank)"), lit(0L)) +
          coalesce(expr(s"$RrfScale div ($RrfK + vec_rank)"), lit(0L)))
          .as("rrf_scaled"))
      .withColumn("rank", row_number().over(w).cast("long"))
  }

  /** SQL twin of [[rrfFused]]: CTEs `lexr` → `frank` (assumes `agg` and
    * `vr` are already in the WITH chain). */
  private def rrfFusedSqlCtes: String =
    s"""lexr AS (SELECT query_id, doc_id, CAST(rn AS BIGINT) AS lex_rank
       |  FROM (SELECT query_id, doc_id, row_number() OVER (
       |      PARTITION BY query_id ORDER BY score_scaled DESC, doc_id) AS rn
       |    FROM agg) r WHERE rn <= $Bm25TopK),
       |fids AS (SELECT query_id, doc_id FROM lexr
       |  UNION SELECT query_id, doc_id FROM vr),
       |fsc AS (SELECT i.query_id, i.doc_id,
       |    CAST(COALESCE(l.lex_rank, 0) AS BIGINT) AS lex_rank,
       |    CAST(COALESCE(v.vec_rank, 0) AS BIGINT) AS vec_rank,
       |    CAST(COALESCE($RrfScale // ($RrfK + l.lex_rank), 0)
       |       + COALESCE($RrfScale // ($RrfK + v.vec_rank), 0) AS BIGINT)
       |      AS rrf_scaled
       |  FROM fids i LEFT JOIN lexr l USING (query_id, doc_id)
       |    LEFT JOIN vr v USING (query_id, doc_id)),
       |frank AS (SELECT query_id, doc_id, lex_rank, vec_rank, rrf_scaled,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY rrf_scaled DESC, doc_id) AS BIGINT) AS rank
       |  FROM fsc)""".stripMargin

  /** BPE merge-table size for text_bpe_apply (the text_bpe_pairs top-k). */
  val BpeMerges = 20

  /** DSIR (importance-resampling data selection): hashed-unigram bucket
    * count, the target slice (the distribution documents are reweighted
    * TOWARD — also the NB classifier's positive class), and the declared
    * top-k. Bucket space deliberately small (real deployments use
    * 10^4–10^5) so collisions are live at harness SFs. */
  val DsirB = 512
  val DsirTarget = "en"
  val DsirTopK = 50

  /** Naive-Bayes classifier hashed-feature width (power of two, like
    * FhDim) and the quality-oracle stopword list (the en marker set
    * widened with common function words). The classification TARGET is
    * a quality rule, not the lang column: measured on this corpus, lang
    * is independent of token content (every lang's docs carry the same
    * en-ish vocabulary — unigram NB lands exactly at the majority
    * baseline), while the stopword-density label is learnable (~85 %
    * vs 51 % baseline at B=1024). That is also the truer task: the
    * published pipelines (CCNet's fastText filter, GPT-3's quality
    * classifier) train a cheap classifier to IMITATE a quality oracle
    * and run it at corpus scale. */
  val NbB = 1024
  val NbStop: Seq[String] = Seq(
    "the", "a", "of", "and", "is", "to", "in", "it", "for", "on")
  /** Stopword-density grid (parts-per-NbSrScale, integer division) for
    * the exact cross-engine median label split. */
  val NbSrScale = 10000L

  /** Reservoir size per stratum and keyterm count per doc. */
  val ReservoirK = 5
  val KeyTermsK = 3

  /** Weighted sampling: global sample size and the uniform-variate
    * modulus (h60 % WsM maps the hash to a (0,1) grid of WsM cells). */
  val WeightedK = 40
  val WsM = 1000000L

  /** Oracle-dump dir for the applied-BPE token rows (the media/pcap dump
    * lifecycle: pid-keyed, written once per JVM by the query itself). */
  private val BpeDumpDir = TmpDirs.persistent(
    s"graft_bpe_dump_${ProcessHandle.current().pid()}").getAbsolutePath

  /** Unigram-LM (SentencePiece-style) tokenizer knobs: max piece length,
    * seed-vocab size (top multi-char substrings by weighted count — ALL
    * single chars are always kept, the coverage guarantee), and hard-EM
    * round count. Small V because the synthetic corpus has a ~31-word
    * vocabulary; a production run raises V, not the algorithm. */
  val UniMaxLen = 4
  val UniSeedV = 120
  val UniEmRounds = 2

  /** Dumps for the unigram pair: the final per-word segmentation rows
    * (the E-step output both queries aggregate) and the model scores the
    * final segmentation ran under (needed by the apply oracle's
    * local-optimality contract — the post-hoc M-step re-estimate the
    * train query declares is NOT the model that segmented). */
  private val UniDumpDir = TmpDirs.persistent(
    s"graft_uni_dump_${ProcessHandle.current().pid()}").getAbsolutePath
  private val UniModelDir = TmpDirs.persistent(
    s"graft_uni_model_${ProcessHandle.current().pid()}").getAbsolutePath

  /** floor(ln(n/tot)·LmLogScale + 0.5) as Long — the Scala spelling of
    * [[sqlIlog]] for driver-side model scores. */
  private def ilogLong(n: Long, tot: Long): Long =
    math.floor(math.log(n.toDouble / tot.toDouble) * LmLogScale + 0.5).toLong

  /** Train the unigram LM and write both dumps, once per (JVM, sf).
    *
    * Hard-EM (Viterbi-EM), the determinism-friendly variant of Kudo
    * 2018's unigram trainer: the E-step assigns each distinct word its
    * single BEST segmentation (integer-scored Viterbi — see
    * [[graft.functions.TextFns.unigramSegment]]), the M-step recounts
    * piece mass from those segmentations (exact Longs) and re-quantizes
    * scores to the LmLogScale grid. No forward-backward float
    * accumulation anywhere, so the fit is bit-deterministic at any
    * partitioning. Distributed shape at 100 TB: the corpus is touched by
    * (a) one word-count scan (map-side combined groupBy — word vocab,
    * not corpus, crosses the wire), (b) one substring-count pass over
    * the DISTINCT-word table for the seed, (c) per EM round one flatMap
    * over the distinct-word table, and (d) one final zero-shuffle
    * per-doc encode map. The model is bounded broadcast state
    * (|chars| + UniSeedV entries) — the BPE merge-table contract. */
  private def unigramDumps(s: org.apache.spark.sql.SparkSession,
                           d: String): Unit =
    uniDone.computeIfAbsent(QuerySpec.jvmScopedKey(d), { _ =>
      import s.implicits._
      val words = QuerySpec.staged(Tables.documents(s, d)
        .select(explode(bpeTokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c")))
      // seed: all substrings of length 1..UniMaxLen, weighted by word
      // occurrence count; every single char kept, top-V multi-char by
      // the (count DESC, piece ASC) total order (TakeOrdered, O(V))
      val subs = words
        .select(explode(expr(
          s"""flatten(transform(sequence(1, length(w)), i ->
             |  transform(sequence(1, least($UniMaxLen, length(w) - i + 1)),
             |    l -> substring(w, i, l))))""".stripMargin)).as("piece"),
          col("c"))
        .groupBy("piece").agg(sum(col("c")).as("n"))
      val chars = subs.filter(length(col("piece")) === 1)
        .collect().map(r => r.getString(0) -> r.getLong(1))
      val multi = subs.filter(length(col("piece")) >= 2)
        .orderBy(col("n").desc, col("piece")).limit(UniSeedV)
        .collect().map(r => r.getString(0) -> r.getLong(1))
      val seed = (chars ++ multi).toMap
      val seedTot = seed.values.sum
      var scores: Map[String, Long] =
        seed.map { case (p, n) => p -> ilogLong(n, seedTot) }
      for (_ <- 1 to UniEmRounds) {
        val sc = scores
        val counts = words.as[(String, Long)]
          .flatMap { case (w, c) =>
            graft.functions.TextFns.unigramSegment(w, sc, UniMaxLen)
              .map(p => (p, c))
          }
          .toDF("piece", "c").groupBy("piece").agg(sum(col("c")).as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        // M-step: multi-char pieces prune at zero mass; single chars
        // floor at 1 so coverage survives every round
        val kept = scores.keysIterator.flatMap { p =>
          val n = counts.getOrElse(p, 0L)
          if (p.length == 1) Some(p -> math.max(n, 1L))
          else if (n > 0) Some(p -> n) else None
        }.toMap
        val tot = kept.values.sum
        scores = kept.map { case (p, n) => p -> ilogLong(n, tot) }
      }
      val finalScores = scores
      // final E-step over the DOCS (the encode pass): zero-shuffle map,
      // one row per (doc, word) with its piece sequence
      val segmented = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), bpeTokens(col("text")).as("ws"))
        .as[(Long, String, Seq[String])]
        .flatMap { case (id, lang, ws) =>
          ws.iterator.zipWithIndex.map { case (w, i) =>
            (id, lang, i.toLong + 1L, w,
              graft.functions.TextFns.unigramSegment(w, finalScores, UniMaxLen))
          }
        }
        .toDF("doc_id", "lang", "word_pos", "word", "pieces")
      segmented.coalesce(1).write.mode("overwrite").parquet(UniDumpDir)
      finalScores.toSeq.sortBy(_._1).toDF("piece", "logp_q")
        .coalesce(1).write.mode("overwrite").parquet(UniModelDir)
    })

  private val uniDone = new java.util.concurrent.ConcurrentHashMap[
    String, Unit]

  /** text_heavy_hitters' DuckDB twin — shared with the parser-route
    * restatement (`sql_heavy_hitters`, [[SqlSurfaceQueries]]). The MG
    * sketch's k=48 exceeds the per-lang token vocabulary, so its
    * estimates are exactly the counts (the measured-contract regime;
    * text_heavy_hitters_lowk exercises the lossy regime). */
  private[queries] val heavyHittersOracleSql: String =
    s"""SELECT lang, tok AS item, count(*) AS est
       |FROM (SELECT lang, unnest(${sqlTokens("text")}) AS tok FROM documents)
       |GROUP BY lang, tok""".stripMargin

  val all: Seq[QuerySpec] = Seq(

    // BPE ENCODE — the tokenizer's apply loop, closing text_bpe_pairs'
    // training half: the top-BpeMerges merge table (count DESC, pair ASC
    // — the exact order text_bpe_pairs already proves bit-equal
    // cross-engine) is collected to the driver (bounded model state, the
    // quantizer contract) and applied per doc to fixpoint — repeatedly
    // merge all non-overlapping occurrences of the highest-priority pair
    // present, restarting from the table top since a merge can enable a
    // higher-priority one. The per-doc loop is genuinely imperative
    // (data-dependent trip count) — a Dataset.map with the merge table in
    // the closure, the §4.3(d) shape a real tokenizer encode uses; at
    // 100 TB it stays a zero-shuffle map over the corpus scan. The
    // merged rows are dumped, and DuckDB re-derives the merge table from
    // the corpus ITSELF and recomputes everything from the dump: token
    // conservation (merged ≤ original), a position-weighted h60 checksum
    // (pins content AND order of every output token), and the fixpoint
    // CONTRACT — no adjacent output pair may appear in the merge table
    // (if one did, the loop would have merged it). A wrong merge order,
    // a missed occurrence, or an overlap bug flips checksum or fixpoint.
    checked("text_bpe_apply", {
      val ck = s"CAST(COALESCE(list_aggregate(list_transform(" +
        s"range(1, len(toks) + 1), i -> i * (${sqlH60("toks[i]")} % 1000000))," +
        s" 'sum'), 0) AS BIGINT)"
      s"""WITH toks0 AS (SELECT ${sqlBpeTokens("text")} AS tk FROM documents),
         |mp AS (SELECT pair FROM (
         |    SELECT unnest(${sqlShingles("tk", 2)}) AS pair FROM toks0) u
         |  GROUP BY pair ORDER BY count(*) DESC, pair LIMIT $BpeMerges),
         |ml AS (SELECT list(pair) AS ms FROM mp),
         |f AS (SELECT * FROM read_parquet('$BpeDumpDir/*.parquet')),
         |adj AS (SELECT lang, n_orig, toks,
         |    list_transform(range(1, len(toks)),
         |      i -> toks[i] || ' ' || toks[i + 1]) AS prs
         |  FROM f),
         |per AS (SELECT lang, n_orig, len(toks) AS n_merged, $ck AS ck,
         |    len(list_filter(prs, p -> list_contains(ms, p))) = 0 AS fp
         |  FROM adj, ml)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_orig) AS BIGINT) AS n_orig_total,
         |  CAST(sum(n_merged) AS BIGINT) AS n_merged_total,
         |  CAST(sum(ck) AS BIGINT) AS checksum_total,
         |  bool_and(n_merged <= n_orig) AS merges_reduce,
         |  bool_and(fp) AS fixpoint
         |FROM per GROUP BY lang""".stripMargin
    }) { (s, d) =>
      import s.implicits._
      // Merge table to the driver: BpeMerges rows by the total order the
      // text_bpe_pairs oracle already pins bit-exact.
      val merges: Seq[(String, String)] = Tables.documents(s, d)
        .select(graft.functions.expr.ShingleExplode(
          bpeTokens(col("text")), 2).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair")).limit(BpeMerges)
        .collect().map { r =>
          val Array(a, b) = r.getString(0).split(" ", 2); (a, b)
        }.toSeq
      val applied = staged(Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), bpeTokens(col("text")).as("tk"))
        .as[(Long, String, Seq[String])]
        .map { case (id, lang, tk) =>
          (id, lang, tk.size,
            graft.functions.TextFns.bpeApply(tk.toIndexedSeq, merges))
        }
        .toDF("doc_id", "lang", "n_orig", "toks"))
      applied.coalesce(1).write.mode("overwrite").parquet(BpeDumpDir)
      val mergesLit = array(merges.map(m => lit(s"${m._1} ${m._2}")): _*)
      val prs = when(size(col("toks")) < 2,
        array().cast("array<string>")).otherwise(
        transform(sequence(lit(1), size(col("toks")) - 1),
          i => concat(element_at(col("toks"), i), lit(" "),
            element_at(col("toks"), i + 1))))
      val ck = aggregate(
        transform(col("toks"), (x, i) => (i + 1) * pmod(h60(x), lit(1000000L))),
        lit(0L), (a, x) => a + x)
      applied
        .select(col("lang"), col("n_orig"), size(col("toks")).as("n_merged"),
          ck.as("ck"),
          (size(filter(prs, p => array_contains(mergesLit, p))) === 0).as("fp"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_orig")).as("n_orig_total"),
          sum(col("n_merged")).as("n_merged_total"),
          sum(col("ck")).as("checksum_total"),
          bool_and(col("n_merged") <= col("n_orig")).as("merges_reduce"),
          bool_and(col("fp")).as("fixpoint"))
    },

    // One BPE training round — the corpus-wide adjacent-pair count that
    // picks the next merge (Sennrich et al. 2016): sub-tokens via the
    // BPE-ish regex split, adjacent pairs via the native 2-shingle
    // generator, counts partially aggregated map-side (pair vocabulary
    // is bounded, not corpus-sized), and the 20 best merge candidates
    // selected by the total order (count DESC, pair ASC) through
    // TakeOrderedAndProject — O(k) driver state. A full tokenizer
    // trainer iterates this exact pass, re-splitting on the chosen
    // merge each round; at 100 TB each round is one scan + one bounded
    // shuffle, which is how production BPE training actually runs.
    checked("text_bpe_pairs",
      s"""WITH toks AS (SELECT ${sqlBpeTokens("text")} AS tk FROM documents),
         |pairs AS (SELECT UNNEST(${sqlShingles("tk", 2)}) AS pair FROM toks)
         |SELECT pair, CAST(count(*) AS BIGINT) AS n_pair
         |FROM pairs GROUP BY 1
         |ORDER BY n_pair DESC, pair LIMIT 20""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(graft.functions.expr.ShingleExplode(
          bpeTokens(col("text")), 2).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("n_pair"))
        .orderBy(col("n_pair").desc, col("pair"))
        .limit(20)
    },

    // UNIGRAM-LM TRAINER (SentencePiece-style, Kudo 2018) — the declared
    // surface is the post-hoc M-step over the final segmentation dump:
    // per-piece corpus mass (exact Long counts over every word
    // occurrence's Viterbi pieces) and the re-quantized LmLogScale-grid
    // log-prob. The Viterbi DP itself is not SQL-expressible, so — the
    // text_bpe_apply gate pattern — the trainer dumps its E-step rows
    // and model, and DuckDB INDEPENDENTLY recomputes the whole M-step
    // arithmetic from the dump: piece mass by unnest+count, the
    // single-char floor and zero-mass pruning rules, the mass total, and
    // the floor(ln(n/tot)·1e4 + 0.5) grid — so a wrong segmentation
    // (mass shifts), a dropped occurrence, a pruning bug, or a
    // quantization drift all flip the hash. Both engines read the SAME
    // dump; the arithmetic is computed twice, shared nowhere.
    checked("text_unigram_train",
      s"""WITH seg AS (SELECT * FROM read_parquet('$UniDumpDir/*.parquet')),
         |model AS (SELECT * FROM read_parquet('$UniModelDir/*.parquet')),
         |mass AS (SELECT piece, CAST(count(*) AS BIGINT) AS n
         |  FROM (SELECT unnest(pieces) AS piece FROM seg) GROUP BY piece),
         |kept AS (SELECT m.piece,
         |    CASE WHEN length(m.piece) = 1
         |      THEN greatest(coalesce(ms.n, 0), 1)
         |      ELSE coalesce(ms.n, 0) END AS n_mass
         |  FROM model m LEFT JOIN mass ms ON ms.piece = m.piece
         |  WHERE length(m.piece) = 1 OR coalesce(ms.n, 0) > 0),
         |tot AS (SELECT CAST(sum(n_mass) AS BIGINT) AS t FROM kept)
         |SELECT piece, n_mass,
         |  ${sqlIlog("CAST(n_mass AS DOUBLE) / t")} AS logp_q
         |FROM kept, tot""".stripMargin) { (s, d) =>
      unigramDumps(s, d)
      val mass = s.read.parquet(UniDumpDir)
        .select(explode(col("pieces")).as("piece"))
        .groupBy("piece").agg(count(lit(1)).as("n"))
      val kept = s.read.parquet(UniModelDir)
        .join(mass, Seq("piece"), "left")
        .withColumn("n0", coalesce(col("n"), lit(0L)))
        .filter(length(col("piece")) === 1 || col("n0") > 0)
        .select(col("piece"),
          when(length(col("piece")) === 1, greatest(col("n0"), lit(1L)))
            .otherwise(col("n0")).as("n_mass"))
      val tot = kept.agg(sum(col("n_mass")).as("t"))
      kept.crossJoin(broadcast(tot))
        .select(col("piece"), col("n_mass"),
          ilogCol(col("n_mass").cast("double") / col("t")).as("logp_q"))
    },

    // UNIGRAM-LM ENCODE — the tokenizer's apply surface over the final
    // model, per-lang aggregated from the per-word Viterbi rows. Four
    // gates: (1) CONSERVATION — concatenating each word's pieces
    // reproduces the word exactly (bool_and, one corrupted row kills its
    // lang row); (2) the position-weighted h60 CHECKSUM over every piece
    // (pins content AND order, the text_bpe_apply convention); (3) the
    // exact integer SCORE TOTAL — each word row's summed piece log-prob,
    // both engines recomputing it from dump x model; and (4) OPTIMALITY,
    // the decisive one: DuckDB re-solves the segmentation problem
    // INDEPENDENTLY — a recursive CTE enumerating every segmentation
    // path of every distinct word over the model vocab (bounded: ~31
    // words <= 8 chars, a tiny path lattice; at 100 TB the same audit
    // runs on a sampled word table) — and asserts every dump row's
    // score EQUALS the true optimum. A greedy-longest-match impostor, a
    // dropped DP transition, or a score-table off-by-one leaves some
    // word below optimal -> `optimal` flips false against Spark's
    // contract-true. This is the cross-engine check the adjacent-pair
    // local-optimality theorem could NOT give on this corpus (measured:
    // zero adjacent output pairs concatenate into vocab — the DP merges
    // every such case — so that weaker contract never decides; the
    // text_heavy_hitters_lowk lesson applied). Shapes: dump x model
    // joins are broadcast lookups against the ~150-piece model; the
    // optimum audit joins per-word-row scores to a distinct-word
    // optimum table — zero wide shuffles.
    checked("text_unigram_apply", {
      val ck = s"CAST(COALESCE(list_aggregate(list_transform(" +
        s"range(1, len(pieces) + 1), " +
        s"i -> i * (${sqlH60("pieces[i]")} % 1000000)), 'sum'), 0) AS BIGINT)"
      s"""WITH RECURSIVE
         |seg AS (SELECT * FROM read_parquet('$UniDumpDir/*.parquet')),
         |model AS (SELECT * FROM read_parquet('$UniModelDir/*.parquet')),
         |per AS (SELECT lang, len(pieces) AS np, $ck AS ck,
         |    array_to_string(pieces, '') = word AS cons
         |  FROM seg),
         |words AS (SELECT DISTINCT word FROM seg),
         |paths AS (
         |  SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS sc FROM words
         |  UNION ALL
         |  SELECT p.word, p.pos + CAST(t.l AS INT) AS pos,
         |    p.sc + m.logp_q AS sc
         |  FROM paths p, (SELECT unnest(range(1, $UniMaxLen + 1)) AS l) t
         |  JOIN model m
         |    ON m.piece = substr(p.word, p.pos + 1, CAST(t.l AS INT))
         |  WHERE p.pos + t.l <= length(p.word)),
         |opt AS (SELECT word, max(sc) AS opt_sc FROM paths
         |  WHERE pos = length(word) GROUP BY word),
         |rowsc AS (SELECT e.doc_id, e.word_pos, any_value(e.lang) AS lang,
         |    any_value(e.word) AS word, CAST(sum(m.logp_q) AS BIGINT) AS dsc
         |  FROM (SELECT doc_id, word_pos, lang, word,
         |      unnest(pieces) AS piece FROM seg) e
         |  JOIN model m ON m.piece = e.piece
         |  GROUP BY e.doc_id, e.word_pos),
         |opta AS (SELECT r.lang, CAST(sum(r.dsc) AS BIGINT) AS score_total,
         |    bool_and(r.dsc = o.opt_sc) AS optimal
         |  FROM rowsc r JOIN opt o ON o.word = r.word GROUP BY r.lang),
         |agg AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
         |    CAST(sum(np) AS BIGINT) AS n_pieces_total,
         |    CAST(sum(ck) AS BIGINT) AS checksum_total,
         |    bool_and(cons) AS conserved
         |  FROM per GROUP BY lang)
         |SELECT a.lang, a.n_words, a.n_pieces_total, a.checksum_total,
         |  o.score_total, a.conserved, o.optimal
         |FROM agg a JOIN opta o ON o.lang = a.lang""".stripMargin
    }) { (s, d) =>
      import s.implicits._
      unigramDumps(s, d)
      val seg = staged(s.read.parquet(UniDumpDir))
      val model = s.read.parquet(UniModelDir)
      val ck = aggregate(
        transform(col("pieces"),
          (x, i) => (i + 1) * pmod(h60(x), lit(1000000L))),
        lit(0L), (a, x) => a + x)
      val agg = seg
        .select(col("lang"), size(col("pieces")).as("np"), ck.as("ck"),
          (concat_ws("", col("pieces")) === col("word")).as("cons"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_words"),
          sum(col("np")).as("n_pieces_total"),
          sum(col("ck")).as("checksum_total"),
          bool_and(col("cons")).as("conserved"))
      // Per-word-row summed piece score (dump x model), then the optimum
      // audit. Spark's optimum re-runs the SAME Viterbi the encode used
      // (unit-pinned in TextFnsSpec); the INDEPENDENT re-derivation is
      // DuckDB's recursive path enumeration — a suboptimal dump row
      // diverges the engines on `optimal`.
      val scoresMap = model.as[(String, Long)].collect().toMap
      val optDf = broadcast(seg.select(col("word")).distinct().as[String]
        .map { w =>
          val ps = graft.functions.TextFns.unigramSegment(
            w, scoresMap, UniMaxLen)
          (w, ps.map(scoresMap).sum)
        }.toDF("word", "opt_sc"))
      val rowsc = seg
        .select(col("doc_id"), col("word_pos"), col("lang"), col("word"),
          explode(col("pieces")).as("piece"))
        .join(broadcast(model), Seq("piece"))
        .groupBy("doc_id", "word_pos")
        .agg(first(col("lang")).as("lang"), first(col("word")).as("word"),
          sum(col("logp_q")).as("dsc"))
      val opta = rowsc.join(optDf, Seq("word"))
        .groupBy("lang")
        .agg(sum(col("dsc")).as("score_total"),
          bool_and(col("dsc") === col("opt_sc")).as("optimal"))
      agg.join(opta, Seq("lang"))
        .select(col("lang"), col("n_words"), col("n_pieces_total"),
          col("checksum_total"), col("score_total"), col("conserved"),
          col("optimal"))
    },

    // Token counting + quality stats. Integer counts are trivially exact;
    // the two ratios are single-divide doubles rounded at the end.
    checked("text_stats",
      s"""WITH t AS (
         |  SELECT doc_id, n_chars, text,
         |    ${sqlTokens("text")} AS toks,
         |    ${sqlBpeTokens("text")} AS bpe
         |  FROM documents)
         |SELECT doc_id, n_chars,
         |  len(toks) AS n_tokens,
         |  len(bpe) AS n_bpe_tokens,
         |  len(list_distinct(toks)) AS n_distinct_tokens,
         |  CASE WHEN len(toks) = 0 THEN 0.0 ELSE
         |    ${sqlR6("CAST(len(array_to_string(toks, '')) AS DOUBLE) / len(toks)")}
         |  END AS avg_token_len,
         |  CASE WHEN len(toks) = 0 THEN 0.0 ELSE
         |    ${sqlR6("""CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','is','to','in'], x))) AS DOUBLE)
         |      / len(toks)""")}
         |  END AS stopword_ratio,
         |  CASE WHEN length(text) = 0 THEN 0.0 ELSE
         |    ${sqlR6("CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE) / length(text)")}
         |  END AS punct_ratio,
         |  CASE WHEN length(text) = 0 THEN 0.0 ELSE
         |    ${sqlR6("CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / length(text)")}
         |  END AS digit_ratio
         |FROM t""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .withColumn("toks", tokens(col("text")))
        .withColumn("bpe", bpeTokens(col("text")))
        .select(
          col("doc_id"), col("n_chars"),
          size(col("toks")).as("n_tokens"),
          size(col("bpe")).as("n_bpe_tokens"),
          size(array_distinct(col("toks"))).as("n_distinct_tokens"),
          when(size(col("toks")) === 0, lit(0.0)).otherwise(
            r6(length(concat_ws("", col("toks"))).cast("double") / size(col("toks"))))
            .as("avg_token_len"),
          when(size(col("toks")) === 0, lit(0.0)).otherwise(
            r6(size(filter(col("toks"),
              x => x.isInCollection(Seq("the", "a", "of", "and", "is", "to", "in"))))
              .cast("double") / size(col("toks"))))
            .as("stopword_ratio"),
          when(length(col("text")) === 0, lit(0.0)).otherwise(
            r6(size(regexp_extract_all(col("text"), lit("[^a-zA-Z0-9\\s]"), lit(0)))
              .cast("double") / length(col("text")))).as("punct_ratio"),
          when(length(col("text")) === 0, lit(0.0)).otherwise(
            r6(size(regexp_extract_all(col("text"), lit("[0-9]"), lit(0)))
              .cast("double") / length(col("text")))).as("digit_ratio"))
    },

    // Language-ID heuristic + confusion matrix vs the labeled lang column.
    checked("lang_id",
      s"""WITH t AS (SELECT lang, ${sqlLangId(sqlTokens("text"))} AS lang_pred
         |  FROM documents)
         |SELECT lang, lang_pred, count(*) AS n
         |FROM t GROUP BY lang, lang_pred""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), langId(tokens(col("text"))).as("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(count(lit(1)).as("n"))
    },

    // Document fingerprints: md5 exact-dup key + base-31 rolling hash of
    // the first 64 token h60s (both cross-engine-exact).
    checked("doc_fingerprint",
      s"""WITH t AS (SELECT doc_id,
         |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp_md5,
         |    ${sqlFingerprint(sqlH60All(sqlTokens("text")))} AS fp_rolling
         |  FROM documents)
         |SELECT doc_id, fp_md5, fp_rolling FROM t""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .withColumn("th", h60All(tokens(col("text"))))
        .select(col("doc_id"),
          md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("fp_md5"),
          fingerprint(col("th")).as("fp_rolling"))
    },

    // Deterministic reservoir sampling — EXACTLY k docs per stratum,
    // uniform without replacement, reproducible: take the k smallest
    // h60(doc_id) per language (a hash total-orders the population, so
    // "k smallest hashes" IS a uniform k-subset — the distributed
    // reservoir idiom; sample_stratified's Bernoulli rate gives a
    // BINOMIAL count, this gives an exact one). Declared: the sampled
    // (lang, rk, doc_id, h) rows. Shape: one window partitioned by the
    // stratum — the corpus shuffles once on lang; at 100 TB with few
    // strata and big partitions the same semantics would ride a bounded
    // per-stratum k-heap partial aggregate (the partial_cos_top_k
    // pattern) instead of a full window sort, same result by
    // construction.
    checked("sample_reservoir",
      s"""WITH t AS (SELECT lang, doc_id,
         |    ${sqlH60("CAST(doc_id AS VARCHAR)")} AS h FROM documents),
         |r AS (SELECT lang, doc_id, h,
         |    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id)
         |      AS rk FROM t)
         |SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id, h
         |FROM r WHERE rk <= $ReservoirK""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      Tables.documents(s, d)
        .select(col("lang"), col("doc_id"),
          h60(col("doc_id").cast("string")).as("h"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("lang").orderBy("h", "doc_id")).cast("long"))
        .filter(col("rk") <= ReservoirK)
        .select(col("lang"), col("rk"), col("doc_id"), col("h"))
    },

    // BLEU-4 between near-duplicate pairs — the generation-eval metric
    // (Papineni et al. 2002; sacrebleu) run where a data pipeline
    // actually runs it: scoring how closely each near-dup CANDIDATE
    // (doc_b) reproduces its REFERENCE (doc_a), the text-overlap
    // measurement contamination/paraphrase audits report next to the
    // Jaccard the dedup pass thresholds on. Faithful modified-n-gram
    // precision: per n ∈ 1..4, clipped matches Σ min(count_cand,
    // count_ref) over the n-gram MULTISETS (the shared shingles()
    // spelling, positions not sets) — all exact BIGINTs, declared
    // per-n beside the add-one-smoothed log-precision sum on the
    // LmLogScale grid (the corpus-standard quantized ln) and the final
    // r6 score exp(min(0, 1 − r/c) + Σlogp/4) (brevity penalty folded
    // into the one exp both engines evaluate on the identical double).
    // exp() is a libm transcendental like ln(): its result can differ
    // by ~1 ulp cross-engine, so a bleu value landing within 1 ulp of
    // an r6 grid boundary could flip the declared digit. The identical
    // analysis as LmLogScale applies: a 1-ulp band around each 1e-6
    // grid line covers ~2^-52/1e-6 ≈ 2e-10 of the unit interval, so
    // per-pair flip odds are ~1e-10 — at the suite's ~1.6e6 pairs the
    // expected boundary hits are ~1e-4, i.e. accepted as negligible by
    // the same convention that admits the quantized ln itself.
    // Shape: docs restricted to pair members (semi join) before any
    // explode; gram counts map-side combine; the pair joins are equi
    // on (doc, n, gram) against the BOUNDED pair-member corpus.
    checked("text_bleu", {
      def ngr(n: Int) =
        if (n == 1) s"SELECT doc_id, 1 AS n, unnest(tk) AS gram FROM td"
        else s"SELECT doc_id, $n, unnest(${sqlShingles("tk", n)}) FROM td"
      def pivot(c: String, n: Int) =
        s"CAST(COALESCE(sum(CASE WHEN n = $n THEN $c END), 0) AS BIGINT)"
      s"""WITH ${DedupQueries.pairsCtesSql},
         |t0 AS (SELECT doc_id, ${sqlTokens("text")} AS tk FROM documents),
         |pd AS (SELECT DISTINCT doc_id FROM (
         |  SELECT doc_a AS doc_id FROM pairs
         |  UNION ALL SELECT doc_b FROM pairs) u),
         |td AS (SELECT t0.doc_id, tk FROM t0 JOIN pd USING (doc_id)),
         |lens AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS len FROM td),
         |g AS (${(1 to 4).map(ngr).mkString("\n  UNION ALL ")}),
         |gc AS (SELECT doc_id, n, gram, CAST(count(*) AS BIGINT) AS c
         |  FROM g GROUP BY 1, 2, 3),
         |tot AS (SELECT p.doc_a, p.doc_b, gc.n, CAST(sum(c) AS BIGINT) AS t
         |  FROM pairs p JOIN gc ON gc.doc_id = p.doc_b GROUP BY 1, 2, 3),
         |mt AS (SELECT p.doc_a, p.doc_b, a.n,
         |    CAST(sum(least(a.c, b.c)) AS BIGINT) AS m
         |  FROM pairs p JOIN gc a ON a.doc_id = p.doc_b
         |    JOIN gc b ON b.doc_id = p.doc_a AND b.n = a.n AND b.gram = a.gram
         |  GROUP BY 1, 2, 3),
         |j AS (SELECT tot.doc_a, tot.doc_b, tot.n, tot.t,
         |    COALESCE(mt.m, 0) AS m
         |  FROM tot LEFT JOIN mt USING (doc_a, doc_b, n)),
         |agg AS (SELECT doc_a, doc_b,
         |    ${(1 to 4).map(n => s"${pivot("m", n)} AS m$n, ${pivot("t", n)} AS t$n").mkString(",\n    ")},
         |    CAST(sum(${sqlIlog("CAST(m + 1 AS DOUBLE) / (t + 1)")})
         |      AS BIGINT) AS slogp_q
         |  FROM j GROUP BY 1, 2)
         |SELECT agg.doc_a, agg.doc_b, lr.len AS r_len, lc.len AS c_len,
         |  m1, t1, m2, t2, m3, t3, m4, t4, slogp_q,
         |  ${graft.functions.DetAgg.sqlR6(
             "exp(least(0.0, 1 - CAST(lr.len AS DOUBLE) / lc.len) " +
               s"+ CAST(slogp_q AS DOUBLE) / ${4 * LmLogScale})")} AS bleu
         |FROM agg JOIN lens lr ON agg.doc_a = lr.doc_id
         |         JOIN lens lc ON agg.doc_b = lc.doc_id""".stripMargin
    }) { (s, d) =>
      val pairs = staged(DedupQueries.nearDupPairsShared(s, d))
      val pd = pairs.select(col("doc_a").as("doc_id"))
        .unionAll(pairs.select(col("doc_b").as("doc_id"))).distinct()
      val td = staged(Tables.documents(s, d)
        .join(pd, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), tokens(col("text")).as("tk")))
      val lens = td.select(col("doc_id"), size(col("tk")).cast("long").as("len"))
      val g = (1 to 4).map { n =>
        val grams = if (n == 1) col("tk") else shingles(col("tk"), n)
        td.select(col("doc_id"), lit(n).as("n"), explode(grams).as("gram"))
      }.reduce(_ unionAll _)
      val gc = staged(g.groupBy("doc_id", "n", "gram")
        .agg(count(lit(1)).as("c")))
      val tot = pairs
        .join(gc.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"))
        .groupBy("doc_a", "doc_b", "n").agg(sum(col("c")).as("t"))
      val mt = pairs
        .join(gc.select(col("doc_id").as("doc_b"), col("n"), col("gram"),
          col("c").as("ca")), Seq("doc_b"))
        .join(gc.select(col("doc_id").as("doc_a"), col("n"), col("gram"),
          col("c").as("cb")), Seq("doc_a", "n", "gram"))
        .groupBy("doc_a", "doc_b", "n")
        .agg(sum(least(col("ca"), col("cb"))).as("m"))
      val j = tot.join(mt, Seq("doc_a", "doc_b", "n"), "left")
        .withColumn("m", coalesce(col("m"), lit(0L)))
      def pv(c: String, n: Int) =
        coalesce(sum(when(col("n") === n, col(c))), lit(0L))
      val aggCols = (1 to 4).flatMap(n =>
        Seq(pv("m", n).as(s"m$n"), pv("t", n).as(s"t$n"))) :+
        sum(ilogCol((col("m") + 1L).cast("double") / (col("t") + 1L)))
          .as("slogp_q")
      val agg = j.groupBy("doc_a", "doc_b").agg(aggCols.head, aggCols.tail: _*)
      agg
        .join(lens.select(col("doc_id").as("doc_a"), col("len").as("r_len")), "doc_a")
        .join(lens.select(col("doc_id").as("doc_b"), col("len").as("c_len")), "doc_b")
        .select(Seq(col("doc_a"), col("doc_b"), col("r_len"), col("c_len")) ++
          (1 to 4).flatMap(n => Seq(col(s"m$n"), col(s"t$n"))) ++ Seq(
          col("slogp_q"),
          graft.functions.DetAgg.r6(exp(
            least(lit(0.0), lit(1.0) - col("r_len").cast("double") / col("c_len")) +
              col("slogp_q").cast("double") / (4.0 * LmLogScale))).as("bleu")): _*)
    },

    // WEIGHTED sampling without replacement — the Efraimidis-Spirakis
    // A-ES scheme (the standard distributed weighted reservoir; what a
    // training-mixture builder runs when documents carry quality or
    // length weights): each doc draws u ∈ (0,1) and the k largest
    // u^(1/w) win — equivalently the k largest ln(u)/w, which is how
    // it's computed here. Determinism pipeline: u = (h60(doc_id) mod
    // WsM + 1)/(WsM + 1) (reproducible, never 0 or 1), ln(u) QUANTIZED
    // to the LmLogScale integer grid (the corpus-standard ilog — the
    // only libm call), and the key is then one exact IEEE division of
    // that integer by the integer weight — identical cross-engine —
    // with ties broken by doc_id. Weight = token count (longer docs
    // proportionally likelier — the mixture-sampling default). Shape:
    // the key is a projection over the token-count aggregate; the
    // global top-k is orderBy().limit() = TakeOrderedAndProject
    // (bounded heap, no global sort), rank computed over the k-row
    // result.
    checked("sample_weighted",
      s"""WITH t AS (SELECT doc_id, lang,
         |    CAST(len(${sqlTokens("text")}) AS BIGINT) AS w,
         |    ${sqlH60("CAST(doc_id AS VARCHAR)")} % $WsM + 1 AS hu
         |  FROM documents),
         |k AS (SELECT doc_id, lang, w,
         |    CAST(${sqlIlog(s"CAST(hu AS DOUBLE) / ${WsM + 1}")} AS DOUBLE)
         |      / w AS key
         |  FROM t WHERE w > 0),
         |top AS (SELECT doc_id, lang, w, key FROM k
         |  ORDER BY key DESC, doc_id LIMIT $WeightedK)
         |SELECT doc_id, lang, w,
         |  CAST(row_number() OVER (ORDER BY key DESC, doc_id) AS BIGINT)
         |    AS rk
         |FROM top""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(tokens(col("text"))).cast("long").as("w"),
          (h60(col("doc_id").cast("string")) % WsM + 1L).as("hu"))
        .filter(col("w") > 0)
        .withColumn("key",
          ilogCol(col("hu").cast("double") / (WsM + 1L).toDouble)
            .cast("double") / col("w"))
        .orderBy(col("key").desc, col("doc_id"))
        .limit(WeightedK)
        .withColumn("rk", row_number().over(
          Window.orderBy(col("key").desc, col("doc_id"))).cast("long"))
        .select(col("doc_id"), col("lang"), col("w"), col("rk"))
    },

    // tf-idf keyword extraction — the top-KeyTermsK highest-tf·idf
    // terms per document (the classic keyterm/tag surface a corpus
    // index publishes). Exactness: idf quantized to the LmLogScale
    // grid per TERM (one fixed IEEE tree over exact BIGINT df/N), so
    // each (doc, term) score tf·iidf_q is an exact integer and the
    // per-doc ranking (score DESC, term ASC) is total-ordered. Shape:
    // tf = one map-side-combined (doc, term) aggregate; df = one
    // aggregate over it; idf broadcasts back onto the tf rows; the
    // per-doc top-k is a window partitioned by doc_id riding the SAME
    // hash partitioning the tf aggregate already produced (one corpus
    // shuffle total); at 100 TB the window becomes a bounded per-doc
    // k-heap partial aggregate, same result.
    checked("text_keyterms", {
      s"""WITH tk AS (SELECT doc_id, unnest(${sqlTokens("text")}) AS t
         |  FROM documents),
         |tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
         |  FROM tk GROUP BY 1, 2),
         |df AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY t),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
         |idf AS (SELECT t,
         |    CAST(floor(ln(CAST(n + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE))
         |      * $LmLogScale + 0.5) AS BIGINT) AS iidf FROM df, n),
         |sc AS (SELECT doc_id, tf.t, tf * iidf AS score_q
         |  FROM tf JOIN idf ON tf.t = idf.t),
         |r AS (SELECT doc_id, t, score_q,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY score_q DESC, t) AS rk FROM sc)
         |SELECT doc_id, CAST(rk AS BIGINT) AS rk, t AS term, score_q
         |FROM r WHERE rk <= $KeyTermsK""".stripMargin
    }) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val tf = staged(Tables.documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
        .groupBy("doc_id", "t").agg(count(lit(1)).as("tf")))
      val dfT = tf.groupBy("t").agg(count(lit(1)).as("df"))
      // Bounded 1-row corpus size (the corpus_clean literal contract).
      val n = Tables.documents(s, d).agg(count(lit(1))).head.getLong(0)
      val idf = dfT.select(col("t").as("ti"),
        ilogCol(lit(n + 1).cast("double") / (col("df") + 1L).cast("double"))
          .as("iidf"))
      tf.join(broadcast(idf), col("t") === col("ti"))
        .select(col("doc_id"), col("t"), (col("tf") * col("iidf")).as("score_q"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("score_q").desc, col("t")))
          .cast("long"))
        .filter(col("rk") <= KeyTermsK)
        .select(col("doc_id"), col("rk"), col("t").as("term"), col("score_q"))
    },

    // Deterministic hash-based stratified sampling — the reproducible
    // train-split primitive every data pipeline needs: membership is a
    // pure function of the row key (h60 % 100 < rate), so the same 20 %
    // sample comes back on every engine, every partitioning, every rerun —
    // unlike TABLESAMPLE/randomSplit, whose membership is partition-
    // dependent. Per-language output pins both the rate and that sampling
    // composes with downstream aggregates (token sums over the sample).
    // Pure projection + one aggregate: no extra shuffle, no data movement
    // for the unsampled 80 %.
    checked("sample_stratified",
      s"""WITH t AS (SELECT lang,
         |    ${sqlH60("CAST(doc_id AS VARCHAR)")} % 100 < 20 AS in_sample,
         |    len(${sqlTokens("text")}) AS n_tok
         |  FROM documents)
         |SELECT lang, count(*) AS n_total,
         |  CAST(sum(CASE WHEN in_sample THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
         |  CAST(sum(CASE WHEN in_sample THEN n_tok ELSE 0 END) AS BIGINT) AS sampled_tokens
         |FROM t GROUP BY lang""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("lang"),
          (h60(col("doc_id").cast("string")) % 100 < 20).as("in_sample"),
          size(tokens(col("text"))).cast("long").as("n_tok"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("in_sample"), 1L).otherwise(0L)).as("n_sampled"),
          sum(when(col("in_sample"), col("n_tok")).otherwise(0L)).as("sampled_tokens"))
    },

    // Shannon entropy of the token-hash distribution per language — reuses
    // the ShannonEntropy UDAF (Q7 gap-closer) on text data, vs DuckDB's
    // native entropy().
    // Greedy decoding through the corpus bigram model — the INFERENCE
    // half of the LM family (text_lm_score trains/scores; this
    // generates): the transition table is per-token argmax over bigram
    // counts (count DESC, successor ASC — deterministic), seeds are the
    // 10 most frequent tokens, and each seed greedily decodes 5 steps.
    // The walk is 5 explicit self-joins of the 10-row frontier against
    // the transition table — at 100 TB the argmax table is |vocab| rows
    // (a bounded model artifact; broadcast), so decode cost is
    // O(seeds·steps), independent of corpus size. A dead-end token
    // (appears only doc-finally) yields NULL and concat_ws skips the
    // tail identically on both engines.
    checked("text_markov_generate", {
      val toks = sqlTokens("text")
      s"""WITH bg0 AS (SELECT ${sqlShingles(toks, 2)} AS bgs FROM documents),
         |bg AS (SELECT unnest(bgs) AS pair FROM bg0),
         |cnt AS (SELECT string_split(pair, ' ')[1] AS w1,
         |    string_split(pair, ' ')[2] AS w2, count(*) AS c
         |  FROM bg GROUP BY 1, 2),
         |trans AS (SELECT w1, w2 AS nxt FROM (
         |  SELECT w1, w2, row_number() OVER (PARTITION BY w1
         |    ORDER BY c DESC, w2) AS rk FROM cnt) WHERE rk = 1),
         |tok AS (SELECT w1 AS t, CAST(sum(c) AS BIGINT) AS n FROM cnt
         |  GROUP BY 1),
         |seed AS (SELECT t AS s0, n FROM (
         |  SELECT t, n, row_number() OVER (ORDER BY n DESC, t) AS rk
         |  FROM tok) WHERE rk <= 10)
         |SELECT s0 AS seed, n AS seed_n,
         |  concat_ws(' ', s0, t1.nxt, t2.nxt, t3.nxt, t4.nxt, t5.nxt)
         |    AS generated
         |FROM seed
         |LEFT JOIN trans t1 ON t1.w1 = s0
         |LEFT JOIN trans t2 ON t2.w1 = t1.nxt
         |LEFT JOIN trans t3 ON t3.w1 = t2.nxt
         |LEFT JOIN trans t4 ON t4.w1 = t3.nxt
         |LEFT JOIN trans t5 ON t5.w1 = t4.nxt""".stripMargin
    }) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      // Native generator (not explode(shingles(...)) — interpreted HOF).
      val cnt = staged(Tables.documents(s, d)
        .select(graft.functions.expr.ShingleExplode(
          tokens(col("text")), 2).as("pair"))
        .select(split(col("pair"), " ").getItem(0).as("w1"),
          split(col("pair"), " ").getItem(1).as("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("c")))
      val trans = cnt
        .withColumn("rk", row_number().over(
          Window.partitionBy("w1").orderBy(col("c").desc, col("w2"))))
        .filter(col("rk") === 1).select(col("w1"), col("w2").as("nxt"))
      val seed = cnt.groupBy(col("w1").as("t")).agg(sum(col("c")).as("n"))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("n").desc, col("t"))))
        .filter(col("rk") <= 10).select(col("t").as("s0"), col("n"))
      def hop(df: org.apache.spark.sql.DataFrame, prev: String, k: Int) =
        df.join(broadcast(trans.select(col("w1").as(s"w$k"),
          col("nxt").as(s"t$k"))), col(prev) === col(s"w$k"), "left")
          .drop(s"w$k")
      val walked = hop(hop(hop(hop(hop(seed, "s0", 1),
        "t1", 2), "t2", 3), "t3", 4), "t4", 5)
      walked.select(col("s0").as("seed"), col("n").as("seed_n"),
        concat_ws(" ", col("s0"), col("t1"), col("t2"), col("t3"),
          col("t4"), col("t5")).as("generated"))
    },

    // Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003, the MOSS
    // algorithm) — the position-aware fingerprint selection the rolling
    // doc_fingerprint hash doesn't do: over each doc's 3-gram h60
    // sequence, every window of 4 consecutive gram hashes selects its
    // minimum (ties to the RIGHTMOST position, the paper's rule), and
    // the distinct (hash, pos) selections are the fingerprints. Spelled
    // with three lead() columns in ONE (doc, pos) window pass +
    // least() + a rightmost-match CASE — no self-join, no per-window
    // explosion; at 100 TB this is a linear scan per doc like every
    // other text pass. The paper's density guarantee — consecutive
    // selections within any window ⇒ gaps ≤ w — is MEASURED per doc
    // and oracle-asserted (gap_ok), not assumed.
    checked("text_winnowing", {
      val grams = sqlH60All(sqlShingles(sqlTokens("text"), 3))
      s"""WITH g0 AS (SELECT doc_id, $grams AS gh FROM documents),
         |g AS (SELECT doc_id, unnest(gh) AS gh,
         |    unnest(range(1, len(gh) + 1)) AS pos FROM g0),
         |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
         |  FROM g GROUP BY doc_id),
         |l AS (SELECT doc_id, gh, pos, lead(gh, 1) OVER w AS g1,
         |    lead(gh, 2) OVER w AS g2, lead(gh, 3) OVER w AS g3
         |  FROM g WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
         |sel AS (SELECT DISTINCT doc_id,
         |    least(gh, g1, g2, g3) AS fh,
         |    CASE WHEN g3 = least(gh, g1, g2, g3) THEN pos + 3
         |         WHEN g2 = least(gh, g1, g2, g3) THEN pos + 2
         |         WHEN g1 = least(gh, g1, g2, g3) THEN pos + 1
         |         ELSE pos END AS fpos
         |  FROM l WHERE g3 IS NOT NULL),
         |gap AS (SELECT doc_id, fpos - lag(fpos) OVER
         |    (PARTITION BY doc_id ORDER BY fpos) AS gp FROM sel),
         |fp AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp,
         |    CAST(sum(fh % 1000000000) AS BIGINT) AS fp_sum
         |  FROM sel GROUP BY doc_id),
         |gk AS (SELECT doc_id, COALESCE(max(gp), 0) <= 4 AS gap_ok
         |  FROM gap GROUP BY doc_id)
         |SELECT cnt.doc_id, n_grams,
         |  COALESCE(n_fp, 0) AS n_fp, COALESCE(fp_sum, 0) AS fp_sum,
         |  COALESCE(gap_ok, true) AS gap_ok
         |FROM cnt LEFT JOIN fp ON cnt.doc_id = fp.doc_id
         |LEFT JOIN gk ON cnt.doc_id = gk.doc_id""".stripMargin
    }) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      // Native generator + codegen'd h60 AFTER it — the shingleRows
      // lesson: the composed posexplode(h60All(shingles(...))) form costs
      // two interpreted HOF lambdas per doc (measured: this query 4.8 s →
      // 1.3 s at sf0.1 on the generator).
      val g = staged(Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.expr.ShingleExplode.withPos(
            tokens(col("text")), 3).as(Seq("pos0", "sstr")))
        .select(col("doc_id"), (col("pos0") + 1).as("pos"),
          h60(col("sstr")).as("gh")))
      val cnt = g.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val mn = least(col("gh"), col("g1"), col("g2"), col("g3"))
      val sel = g
        .withColumn("g1", lead(col("gh"), 1).over(w))
        .withColumn("g2", lead(col("gh"), 2).over(w))
        .withColumn("g3", lead(col("gh"), 3).over(w))
        .filter(col("g3").isNotNull)
        .select(col("doc_id"), mn.as("fh"),
          when(col("g3") === mn, col("pos") + 3)
            .when(col("g2") === mn, col("pos") + 2)
            .when(col("g1") === mn, col("pos") + 1)
            .otherwise(col("pos")).as("fpos"))
        .distinct()
      val fp = sel.groupBy("doc_id")
        .agg(count(lit(1)).as("n_fp"),
          sum(col("fh") % 1000000000L).as("fp_sum"))
      val gw = Window.partitionBy("doc_id").orderBy("fpos")
      val gk = sel.withColumn("gp", col("fpos") - lag(col("fpos"), 1).over(gw))
        .groupBy("doc_id")
        .agg((coalesce(max(col("gp")), lit(0L)) <= 4).as("gap_ok"))
      cnt.join(fp, Seq("doc_id"), "left").join(gk, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_grams"),
          coalesce(col("n_fp"), lit(0L)).as("n_fp"),
          coalesce(col("fp_sum"), lit(0L)).as("fp_sum"),
          coalesce(col("gap_ok"), lit(true)).as("gap_ok"))
    },

    checked("text_entropy",
      s"""WITH t AS (SELECT lang, unnest(${sqlH60All(sqlTokens("text"))}) AS th
         |  FROM documents)
         |SELECT lang, count(*) AS n_tokens, ${sqlR6("entropy(th)")} AS token_entropy
         |FROM t GROUP BY lang""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), explode(tokens(col("text"))).as("tok"))
        .select(col("lang"), h60(col("tok")).as("th"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_tokens"),
          r6(graft.functions.ShannonEntropy.ofLong(col("th"))).as("token_entropy"))
    },

    // Heavy hitters via the Misra-Gries sketch (native
    // TypedImperativeAggregate, graft.functions.expr.FreqSketch): frequent
    // tokens per language with at most k counters per group — partials
    // reduce map-side, O(groups × k) entries cross the exchange, where the
    // exact GROUP BY shuffles one row per distinct token (unbounded on a
    // 100 TB web corpus). Operating point: the corpus vocabulary (31
    // whitespace tokens) is below k = 48, where MG provably never
    // decrements and estimates are EXACT — so the oracle is the full
    // bit-exact DuckDB GROUP BY while the sketch machinery (per-partition
    // partials, serialize, merge) still runs for real. The
    // more-distinct-than-k regime (decrements, merge compression, the
    // n/(k+1) error and coverage bounds) is pinned by FreqSketchSpec.
    checked("text_heavy_hitters", TextQueries.heavyHittersOracleSql) { (s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), explode(tokens(col("text"))).as("item"))
        .groupBy("lang")
        .agg(graft.functions.expr.FreqSketch.sketch(col("item"), 48).as("sk"))
        .select(col("lang"), explode(col("sk")).as("e"))
        .select(col("lang"), col("e.item").as("item"), col("e.est").as("est"))
    },

    // The SAME sketch in its approximation regime (round-6 verdict #5):
    // k = 8 over BPE sub-tokens, whose per-language vocabulary exceeds k —
    // so real decrements (a full buffer meeting unseen items) and merge
    // compression (the (k+1)-th-largest subtraction when partials combine)
    // run inside the declared query, not just under specs. With decrements
    // the surviving counter SET depends on arrival order (inherent to MG),
    // so the query doesn't return the sketch rows; it returns the MG
    // CONTRACT, measured: coverage (every item with true count > n/(k+1)
    // is present), the estimate bounds (true − n/(k+1) ≤ est ≤ true, in
    // exact integer arithmetic: (tc − est)·(k+1) ≤ n), and the size cap
    // (≤ k survivors) — each a boolean the DuckDB twin asserts as literal
    // true, alongside bit-exact n/distinct totals and a `decremented`
    // witness that the approximation regime was actually entered. The
    // exact per-(lang, token) counts that feed the checks are themselves a
    // bounded GROUP BY (BPE vocab, not web-scale) — the 100 TB operator
    // under test is the sketch aggregate.
    checked("text_heavy_hitters_lowk",
      s"""WITH t AS (SELECT lang, unnest(${sqlBpeTokens("text")}) AS item
         |  FROM documents),
         |g AS (SELECT lang, item, count(*) AS tc FROM t GROUP BY 1, 2)
         |SELECT lang, CAST(sum(tc) AS BIGINT) AS n_tokens,
         |  count(*) AS n_distinct,
         |  count(*) > 8 AS decremented,
         |  true AS coverage_ok, true AS bounds_ok, true AS sketch_bounded
         |FROM g GROUP BY lang""".stripMargin) { (s, d) =>
      val k = 8
      val toks = Tables.documents(s, d)
        .select(col("lang"), explode(bpeTokens(col("text"))).as("item"))
      val exact = toks.groupBy("lang", "item").agg(count(lit(1)).as("tc"))
      val sk = toks.groupBy("lang")
        .agg(graft.functions.expr.FreqSketch.sketch(col("item"), k).as("sk"))
        .select(col("lang"), explode(col("sk")).as("e"))
        .select(col("lang"), col("e.item").as("item"), col("e.est").as("est"))
      val totals = exact.groupBy("lang")
        .agg(sum(col("tc")).as("n"), count(lit(1)).as("nd"))
      // MG items always come from the stream, so exact ⊇ sketch and a
      // left join loses nothing; est is null for non-surviving items.
      exact.join(sk, Seq("lang", "item"), "left_outer")
        .join(totals, "lang")
        .groupBy("lang")
        .agg(
          max(col("n")).as("n_tokens"),
          max(col("nd")).as("n_distinct"),
          (max(col("nd")) > k).as("decremented"),
          bool_and(when(col("tc") * (k + 1) > col("n"), col("est").isNotNull)
            .otherwise(lit(true))).as("coverage_ok"),
          bool_and(when(col("est").isNotNull,
            col("est") <= col("tc") &&
              (col("tc") - col("est")) * (k + 1) <= col("n"))
            .otherwise(lit(true))).as("bounds_ok"),
          (sum(when(col("est").isNotNull, 1L).otherwise(0L)) <= k)
            .as("sketch_bounded"))
    },

    // Sequence packing — the sample-packing step between a cleaned corpus
    // and a trainer: assign documents to fixed-token-budget bins (2048
    // here) so each training example concatenates whole documents with
    // minimal padding. Greedy start-offset packing, made distributed: a
    // running token count over each LANGUAGE SHARD (cumulative window,
    // exact integers) gives every document its start offset, and
    // bin = start_offset div budget — a document belongs to the bin its
    // first token lands in (straddlers continue into the next bin, the
    // usual packed-pretraining convention). Per-shard windows are the
    // production shape: packing is inherently sequential WITHIN a stream,
    // so at 100 TB you pack within bounded shards (language × source ×
    // date), each an independent window partition — never one global
    // ordering. Output: per-bin document count, token total (can overrun
    // the budget by at most one straddling document), and id range.
    checked("corpus_pack",
      s"""WITH t AS (SELECT lang, doc_id, len(${sqlTokens("text")}) AS n_tok
         |  FROM documents),
         |o AS (SELECT lang, doc_id, n_tok,
         |    CAST(coalesce(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
         |  FROM t)
         |SELECT lang, CAST(off // 2048 AS BIGINT) AS bin, count(*) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS toks,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM o GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy("doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      Tables.documents(s, d)
        .select(col("lang"), col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_tok"))
        .withColumn("off", coalesce(sum(col("n_tok")).over(w), lit(0L)))
        .withColumn("bin", expr("off div 2048"))
        .groupBy("lang", "bin")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("toks"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
    },

    // Overlapping-window CHUNKING — corpus_pack's dual, and the other
    // half every training/RAG pipeline needs: split each document into
    // fixed-token-budget windows (W = 64 tokens, stride 56 — 8-token
    // overlap so no boundary context is lost), chunk i covering tokens
    // [i*56, i*56+64) with the last chunk allowed shorter — every token
    // lands in a chunk, consecutive chunks share exactly the overlap,
    // and a doc within budget is one chunk. Pure per-row fan-out: tokens → a computed
    // chunk-count → posexplode of the start sequence → slice + join —
    // the chunk TEXT exists only inside the projection (hashed to the
    // cross-engine 60-bit fingerprint before any shuffle), so at 100 TB
    // this is a codegen'd map whose only shuffle is the per-language
    // rollup of 24-byte rows. Oracle: DuckDB rebuilds the identical
    // chunking with range/list-slice and the same h60.
    checked("corpus_chunk",
      s"""WITH t AS (SELECT lang, doc_id, ${sqlTokens("text")} AS toks
         |  FROM documents),
         |n AS (SELECT lang, doc_id, toks, len(toks) AS n FROM t),
         |c AS (SELECT lang, doc_id, toks, n,
         |    unnest(range(CASE WHEN n = 0 THEN 0 WHEN n <= 64 THEN 1
         |      ELSE 1 + CAST(ceil((n - 64) / 56.0) AS BIGINT) END)) AS i
         |  FROM n),
         |ch AS (SELECT lang, doc_id, i,
         |    CAST(i * 56 AS BIGINT) AS st,
         |    CAST(LEAST(i * 56 + 64, n) - i * 56 AS BIGINT) AS leng,
         |    array_to_string(toks[i * 56 + 1 : i * 56 + LEAST(i * 56 + 64, n) - i * 56], ' ') AS chunk
         |  FROM c)
         |SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(sum(leng) AS BIGINT) AS sum_chunk_tokens,
         |  CAST(max(leng) AS BIGINT) AS max_chunk_tokens,
         |  CAST(count(DISTINCT ${sqlH60("chunk")}) AS BIGINT) AS n_distinct
         |FROM ch GROUP BY 1""".stripMargin) { (s, d) =>
      val W = 64L; val S = 56L
      Tables.documents(s, d)
        .select(col("lang"), col("doc_id"), tokens(col("text")).as("toks"))
        .withColumn("n", size(col("toks")).cast("long"))
        .withColumn("nc",
          when(col("n") === 0L, lit(0L))
            .when(col("n") <= W, lit(1L))
            .otherwise(lit(1L) +
              ceil((col("n") - W).cast("double") / S).cast("long")))
        .withColumn("i", explode(
          when(col("nc") === 0L, array().cast("array<long>"))
            .otherwise(sequence(lit(0L), col("nc") - 1L))))
        .withColumn("st", col("i") * S)
        .withColumn("leng", least(col("st") + W, col("n")) - col("st"))
        .withColumn("chunk", array_join(
          slice(col("toks"), (col("st") + 1L).cast("int"),
            col("leng").cast("int")), " "))
        .groupBy("lang")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_chunks"),
          sum(col("leng")).as("sum_chunk_tokens"),
          max(col("leng")).as("max_chunk_tokens"),
          countDistinct(h60(col("chunk")))
            .as("n_distinct"))
    },

    // CHUNK → EMBED → INDEX — the full RAG ingest shape end-to-end:
    // corpus_chunk's overlapping windows (W = 64, stride 56) feed the
    // ml_feature_hash vectorizer (per CHUNK instead of per doc — same
    // h60/sign/width scheme, so the embedding needs no vocabulary pass),
    // and each chunk vector is assigned to its nearest coarse-quantizer
    // list (the ann_ivf/dedup_semantic fixed-id init, here the first
    // chunk of docs CciBase..CciBase+CciLists). Shape at 100 TB: the
    // chunk fan-out and token hashing are codegen'd projections; the
    // ONLY data-sized shuffle is the two-level vector assembly
    // (map-side-combined to ≤ FhDim cells per chunk, then one row per
    // chunk); the centroid set is bounded driver model state inlined as
    // literals, so the IVF assignment itself is a pure argmin projection
    // — zero shuffle, exactly the stream_ivf_ingest contract but fed by
    // chunks. All-integer distances (counts, not floats): the argmin is
    // hash-pinned, ties → lowest c_id.
    checked("corpus_chunk_index",
      s"""WITH $cciChainSqlCtes,
         |dist AS (SELECT v.doc_id, v.i, v.leng, c.c_id,
         |    v.n2 - 2 * ${sqlDotInt("v.vv", "c.cv", FhDim)} + c.cn2 AS dd
         |  FROM vn v CROSS JOIN cent c)
         |SELECT doc_id, CAST(i AS BIGINT) AS chunk_i, leng AS n_tokens,
         |  CAST(c_id AS BIGINT) AS c_id, CAST(dd AS BIGINT) AS dist
         |FROM (SELECT doc_id, i, leng, c_id, dd, row_number() OVER (
         |    PARTITION BY doc_id, i ORDER BY dd, c_id) AS rn FROM dist) r
         |WHERE rn = 1""".stripMargin) { (s, d) =>
      // Centroids from the filtered seed scan; the corpus chain is then
      // consumed ONCE by the assignment projection — no localCheckpoint
      // needed (r21: two full-corpus materializations → one lazy pass).
      val cent = cciCentroids(s, d)
      cciAssign(cciVecsLazy(s, d), cent)
        .select(col("doc_id"), col("i").as("chunk_i"),
          col("leng").as("n_tokens"), col("c_id"), col("dist"))
    },

    // QUERY → CHUNK retrieval THROUGH the chunk index — the read half of
    // the RAG loop corpus_chunk_index ingests for: each BM25 query's
    // term bag is embedded by the SAME no-vocabulary feature-hash scheme
    // (query-side consistency is the whole point of hashing vectorizers:
    // no vocab to ship), probes its CciProbe nearest coarse lists, and
    // retrieves the RagTopK nearest chunks WITHIN the probed lists by
    // exact integer distance. Shape at 100 TB: query vectors and their
    // probe lists are bounded driver model state (|queries| rows),
    // broadcast into a join that touches only the probed lists'
    // chunks — CciProbe/CciLists of the corpus, partition-prunable when
    // the index is persisted list-partitioned (ann_ivf_incremental's
    // layout); the per-query top-k reduces map-side. All-integer
    // distances: the ranking is hash-pinned, ties → (doc_id, chunk_i).
    checked("rag_chunk_retrieve", ragRetrieveSql) { (s, d) =>
      // r21: memoized filtered-seed centroids + the explode-route probe
      // fan-out (see ragCandidatesComputed) — ONE lazy corpus pass, no
      // checkpoint, no join; was two checkpointed materializations of
      // the full chunk chain per invocation.
      val cand = ragCandidatesComputed(s, d)
        .select(col("query_id"), col("doc_id"), col("i"),
          (col("qn2") - lit(2.0) * dotInt(col("qv"), col("vv")) + col("n2"))
            .as("dd"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("dd"), col("doc_id"), col("i"))
      cand.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= RagTopK)
        .select(col("query_id").cast("int").as("query_id"), col("doc_id"),
          col("i").as("chunk_i"), col("dd").cast("long").as("dist"),
          col("rank"))
    },

    // PERSISTED incremental chunk index — ann_ivf_incremental's store
    // lifecycle applied to the RAG read path: the chunk index is built
    // ONCE per (JVM, sf) as a list-partitioned parquet store in two
    // writes — a base build (doc_id % 10 <> 7) and an appended "new
    // shard" (doc_id % 10 = 7) assigned against the SAME frozen
    // centroids — and the query answers THROUGH the store. The oracle is
    // rag_chunk_retrieve's own computing chain, so the gate is the
    // store-vs-computed IDENTITY: an incrementally-built index must
    // answer byte-for-byte like the from-scratch computation (frozen
    // quantizer ⇒ assignment is arrival-order-free). Shape at 100 TB:
    // ingest appends are partition-local (no old-list rewrite when a
    // shard lands), and the probe join prunes to the probed lists'
    // PARTITIONS of the store — CciProbe/CciLists of the index ever
    // read, at any corpus size.
    checked("rag_chunk_incremental", ragRetrieveSql) { (s, d) =>
      // r21: steady-state (store already built) now computes ONLY the
      // filtered centroid scan + the pruned store probe — the full
      // corpus chain is paid exclusively inside the once-per-(JVM, sf)
      // build branch, where it is staged because both shard writes
      // consume it.
      val cent = cciCentroids(s, d)
      val dir = TmpDirs.scoped(s"graft_ragstore_${QuerySpec.jvmScopedKey(d)}")
      val ready = new java.io.File(dir, "_READY")
      val store = new java.io.File(dir, "index").getAbsolutePath
      if (!ready.exists()) {
        val asg = staged(cciAssign(cciVecsLazy(s, d), cent)
          .select(col("doc_id"), col("i"), col("vv"), col("n2"), col("c_id")))
        asg.filter(col("doc_id") % 10 =!= 7)
          .write.mode("overwrite").partitionBy("c_id").parquet(store)
        asg.filter(col("doc_id") % 10 === 7)
          .write.mode("append").partitionBy("c_id").parquet(store)
        ready.createNewFile(): Unit
      }
      val idx = s.read.parquet(store)
        .select(col("doc_id"), col("i"), col("vv"), col("n2"),
          col("c_id").cast("long").as("c_id"))
      ragRetrieve(ragQueryProbes(s, cent), idx)
    },

    // STREAMING chunk ingestion — the last RAG lifecycle edge
    // (stream_ivf_ingest's contract applied to the chunk index): docs
    // arrive as a bounded two-micro-batch stream (base corpus, then the
    // doc_id % 10 = 7 "new crawl shard") and a foreachBatch sink runs
    // the FULL ingest chain per batch — chunk (W=64/S=56 windows) →
    // feature-hash embed → assign against the FROZEN coarse quantizer —
    // and appends into the c_id-partitioned store. Chunking and hashing
    // are per-doc computations and the quantizer is frozen literal
    // state, so micro-batch boundaries are provably invisible: the
    // drained store must answer the standard retrieval byte-for-byte
    // like the from-scratch computation — the oracle is
    // rag_chunk_retrieve's own computing chain (the
    // rag_chunk_incremental identity gate, now reached THROUGH
    // Structured Streaming). Scale shape: ingest cost is one scan of
    // each arriving batch (chunk fan-out + hash are codegen'd
    // projections, the vector assembly's map-side combine stays inside
    // the batch), appends are partition-local, and the probe join reads
    // only the probed lists' partitions at any corpus size.
    checked("stream_chunk_ingest", ragRetrieveSql) { (s, d) =>
      // r21: the frozen quantizer comes from the filtered seed scan —
      // steady state pays no full-corpus chain at all (the per-batch
      // ingest chain lives in the once-per-(JVM, sf) build below).
      val cent = cciCentroids(s, d)
      val dir = TmpDirs.scoped(s"graft_ragstream_${QuerySpec.jvmScopedKey(d)}")
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
        def oneFile(df: org.apache.spark.sql.DataFrame, name: String,
                    bumpMs: Long): Unit = {
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
              System.currentTimeMillis() + bumpMs)): Unit
        }
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        oneFile(docs.filter(col("doc_id") % 10 =!= 7), "base.parquet", 0L)
        // mtime +2 s: FileStreamSource orders micro-batches by file
        // modification time; the new shard must arrive second.
        oneFile(docs.filter(col("doc_id") % 10 === 7), "batch.parquet", 2000L)
        val ingest = s.readStream
          .schema(org.apache.spark.sql.types.StructType.fromDDL(
            "doc_id BIGINT, text STRING"))
          .option("maxFilesPerTrigger", 1)
          .parquet(feed.getAbsolutePath)
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            cciAssign(cciVecsOver(b), cent)
              .select(col("doc_id"), col("i"), col("vv"), col("n2"),
                col("c_id"))
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
      val idx = s.read.parquet(store)
        .select(col("doc_id"), col("i"), col("vv"), col("n2"),
          col("c_id").cast("long").as("c_id"))
      ragRetrieve(ragQueryProbes(s, cent), idx)
    },

    // PII scrubbing — the redaction pass every pretraining pipeline runs
    // before text ships: emails → <EMAIL>, IPv4 → <IP>, phone-shaped
    // digit groups → <PHONE>, with per-class match counts. Pure per-row
    // projection: at 100 TB this is a codegen'd map over the corpus scan,
    // no shuffle at all. Patterns stay in the Java∩RE2 common subset
    // (character classes, bounded repeats — no lookaround/backrefs) so
    // both engines implement identical semantics, and the hash compare
    // across every row IS the dialect-parity pin. The synthetic corpus
    // carries no PII (zero digits), so the demo PLANTS deterministic
    // PII derived from each row's own values (doc_id, source) before
    // redacting — the counts then assert every planted item is found.
    checked("pii_redact", {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ip = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
      val phone = "[0-9]{3}-[0-9]{4}"
      s"""WITH aug AS (
         |  SELECT doc_id,
         |    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@' || source
         |      || '.org ip 10.' || CAST(doc_id % 200 AS VARCHAR) || '.'
         |      || CAST(doc_id % 97 AS VARCHAR) || '.7 tel 555-'
         |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
         |  FROM documents)
         |SELECT doc_id,
         |  len(regexp_extract_all(t, '$email')) AS n_email,
         |  len(regexp_extract_all(t, '$ip')) AS n_ip,
         |  len(regexp_extract_all(regexp_replace(t, '$ip', '<IP>', 'g'),
         |    '$phone')) AS n_phone,
         |  regexp_replace(regexp_replace(regexp_replace(t,
         |    '$email', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'),
         |    '$phone', '<PHONE>', 'g') AS clean_text
         |FROM aug""".stripMargin
    }) { (s, d) =>
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ip = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
      val phone = "[0-9]{3}-[0-9]{4}"
      Tables.documents(s, d)
        .withColumn("t", concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@"), col("source"), lit(".org ip 10."),
          (col("doc_id") % 200).cast("string"), lit("."),
          (col("doc_id") % 97).cast("string"), lit(".7 tel 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .select(col("doc_id"),
          regexp_count(col("t"), lit(email)).as("n_email"),
          regexp_count(col("t"), lit(ip)).as("n_ip"),
          // phone counted after IP masking: the IP's trailing octets would
          // otherwise alias into phone-shaped digit runs.
          regexp_count(regexp_replace(col("t"), ip, "<IP>"), lit(phone)).as("n_phone"),
          regexp_replace(regexp_replace(regexp_replace(col("t"),
            email, "<EMAIL>"), ip, "<IP>"), phone, "<PHONE>").as("clean_text"))
    },

    // Intra-document repetition (the Gopher repetition rule family, Rae
    // et al. 2021 §A1.1.1): the fraction of a document's word trigrams
    // that are duplicates — boilerplate/spam pages score high and get
    // dropped before pretraining. Pure per-row projection over the scan
    // (size/array_distinct on the shingle array — no shuffle at all at
    // any scale); the keep/drop FLAG is computed in exact integer
    // arithmetic on both engines ((T − D)·100 > T·thr%), so the decision
    // itself is hash-pinned, not just the rounded ratio.
    checked("text_repetition",
      s"""WITH t AS (SELECT doc_id,
         |    ${sqlShingles(sqlTokens("text"), 3)} AS tri
         |  FROM documents)
         |SELECT doc_id, len(tri) AS n_tri,
         |  len(list_distinct(tri)) AS n_distinct_tri,
         |  CASE WHEN len(tri) = 0 THEN 0.0 ELSE
         |    ${sqlR6("CAST(len(tri) - len(list_distinct(tri)) AS DOUBLE) / len(tri)")}
         |  END AS dup_frac6,
         |  (len(tri) - len(list_distinct(tri))) * 100 > len(tri) * $RepThrPct
         |    AS repetitive
         |FROM t""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .withColumn("tri", shingles(tokens(col("text")), 3))
        .select(col("doc_id"),
          size(col("tri")).as("n_tri"),
          size(array_distinct(col("tri"))).as("n_distinct_tri"),
          when(size(col("tri")) === 0, lit(0.0)).otherwise(
            r6((size(col("tri")) - size(array_distinct(col("tri"))))
              .cast("double") / size(col("tri")))).as("dup_frac6"),
          ((size(col("tri")) - size(array_distinct(col("tri")))) * 100 >
            size(col("tri")) * RepThrPct).as("repetitive"))
    },

    // Benchmark decontamination (the GPT-3 appendix-C / standard eval-
    // hygiene pass): flag every training document sharing a 13-gram with
    // the held-out benchmark set, so eval answers can't leak into
    // training. Benchmark here = the deterministic doc_id % $ContamMod
    // slice (a stand-in for MMLU/GSM8K text; the planted near-dup
    // families make the overlap non-trivial). Plan shape: one distinct
    // (doc_id, 13-gram-h60) inverted index feeds both sides — the
    // benchmark gram SET and the per-doc totals — then one semi join +
    // two aggregates. At 100 TB the benchmark side is a few MB of
    // hashes: it broadcasts, and the pass costs one corpus scan + a
    // map-side semi join (no corpus-wide pair shuffle); contamination is
    // decided on exact integer hit counts, hash-pinned by the oracle.
    checked("text_contamination",
      s"""WITH sh AS (SELECT doc_id,
         |    list_distinct(${sqlH60All(sqlShingles(sqlTokens("text"), ContamGram))}) AS g
         |  FROM documents),
         |e AS (SELECT doc_id, unnest(g) AS h FROM sh),
         |b AS (SELECT DISTINCT h FROM e WHERE doc_id % $ContamMod = 0),
         |c AS (SELECT doc_id, h FROM e WHERE doc_id % $ContamMod <> 0),
         |tot AS (SELECT doc_id, count(*) AS n_grams FROM c GROUP BY doc_id),
         |hits AS (SELECT c.doc_id, count(*) AS n_hits
         |  FROM c JOIN b USING (h) GROUP BY c.doc_id)
         |SELECT d.doc_id,
         |  COALESCE(n_grams, 0) AS n_grams,
         |  COALESCE(n_hits, 0) AS n_hits,
         |  COALESCE(n_hits, 0) > 0 AS contaminated
         |FROM (SELECT doc_id FROM documents WHERE doc_id % $ContamMod <> 0) d
         |LEFT JOIN tot ON d.doc_id = tot.doc_id
         |LEFT JOIN hits ON d.doc_id = hits.doc_id""".stripMargin) { (s, d) =>
      val grams = staged(Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.expr.ShingleExplode(
            tokens(col("text")), ContamGram).as("sstr"))
        .select(col("doc_id"), h60(col("sstr")).as("h"))
        .distinct())
      val bench = grams.filter(col("doc_id") % ContamMod === 0)
        .select("h").distinct()
      val corpus = grams.filter(col("doc_id") % ContamMod =!= 0)
      val tot = corpus.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
      val hits = corpus.join(bench, Seq("h"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
      Tables.documents(s, d).filter(col("doc_id") % ContamMod =!= 0)
        .select("doc_id")
        .join(tot, Seq("doc_id"), "left")
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_grams"), lit(0L)).as("n_grams"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
    },

    // Mixture rebalancing (the Pile/Dolma-style data-mixing pass): given
    // per-language target weights, derive the deterministic per-language
    // sampling rate that reshapes the corpus toward the target token
    // proportions — rate_l = min(1, w_l·T / (100·T_l)) as an integer
    // threshold in 0..10000 — then decide every document by hash.
    // Integer arithmetic end-to-end: the threshold is an exact integral
    // divide (DECIMAL(38)/HUGEINT intermediate so w·T·10⁴ cannot
    // overflow at real corpus sizes) and the keep decision is
    // h60(doc_id) % 10000 < thr, so every per-doc decision is hash-pinned
    // by the oracle, not just the aggregate counts. Plan shape: one
    // narrow (doc_id, lang, n_tok) projection staged once feeds the
    // per-lang totals (5 rows), the grand total (1 row), and the decision
    // pass; the 5-row threshold table broadcasts back onto the corpus.
    // At 100 TB: two columnar scans of 3 pruned columns (or one +
    // persist), tiny aggregates, zero corpus-wide shuffles.
    checked("corpus_mixture",
      s"""WITH t AS (SELECT doc_id, lang,
         |    CAST(len(${sqlTokens("text")}) AS BIGINT) AS n_tok
         |  FROM documents),
         |lt AS (SELECT lang, CAST(sum(n_tok) AS BIGINT) AS lt
         |  FROM t GROUP BY lang),
         |g AS (SELECT CAST(sum(n_tok) AS BIGINT) AS tt FROM t),
         |thr AS (SELECT lang,
         |    CAST(LEAST(10000, (w * CAST(tt AS HUGEINT) * 10000)
         |      // (lt * 100)) AS BIGINT) AS mix_thr
         |  FROM (SELECT lang, lt, $sqlMixW AS w FROM lt) x, g)
         |SELECT t.doc_id, t.lang, t.n_tok, thr.mix_thr,
         |  ${sqlH60("CAST(t.doc_id AS VARCHAR)")} % 10000 < thr.mix_thr
         |    AS kept
         |FROM t JOIN thr USING (lang)""".stripMargin) { (s, d) =>
      val t = staged(Tables.documents(s, d).select(col("doc_id"), col("lang"),
        size(tokens(col("text"))).cast("long").as("n_tok")))
      val lt = t.groupBy("lang").agg(sum("n_tok").as("lt"))
      val g = t.agg(sum("n_tok").as("tt"))
      val w = MixWeights.tail.foldLeft(
        when(col("lang") === MixWeights.head._1, lit(MixWeights.head._2))) {
        case (acc, (l, wt)) => acc.when(col("lang") === l, lit(wt))
      }.otherwise(lit(0L))
      val thr = lt.crossJoin(broadcast(g))
        .withColumn("w", w)
        .selectExpr("lang",
          "least(10000L, (CAST(w AS DECIMAL(38,0)) * tt * 10000) div (lt * 100)) AS mix_thr")
      t.join(broadcast(thr), Seq("lang"))
        .select(col("doc_id"), col("lang"), col("n_tok"), col("mix_thr"),
          (h60(col("doc_id").cast("string")) % 10000 < col("mix_thr"))
            .as("kept"))
    },

    // LM quality scoring (the CCNet/KenLM shape: score text against an
    // n-gram LM trained on reference text; high perplexity → drop or
    // down-bucket). Bigram LM with add-one smoothing trained on the
    // deterministic 20 % reference slice; every doc with ≥1 bigram gets
    // avg negative log P(w_i | w_{i-1}) = -Σ [ln(c2+1) − ln(c1+V)] / n.
    // Each log term is quantized to the LmLogScale integer grid (see the
    // constant's doc) so the per-doc sum is an exact BIGINT in both
    // engines regardless of accumulation order — the one float divide
    // happens once per doc on identical integers, then r6. Plan shape:
    // bigram rows (linear, native generator) left-join the two ref count
    // tables on their hashes and the 1-row vocab size broadcasts; per-doc
    // sums are a hash aggregate. At 100 TB the LM is a fixed-size
    // artifact (CCNet ships one) and both count joins become broadcasts;
    // nothing here is quadratic — the joins and aggregates are linear in
    // corpus tokens.
    checked("text_lm_score", {
      def ilog(x: String) = sqlIlog(x)
      s"""WITH toks AS (SELECT doc_id, ${sqlTokens("text")} AS tk
         |  FROM documents),
         |b AS (SELECT doc_id, unnest(${sqlShingles("tk", 2)}) AS s
         |  FROM toks),
         |e AS (SELECT doc_id, ${sqlH60("s")} AS h2,
         |    ${sqlH60("split_part(s, ' ', 1)")} AS h1 FROM b),
         |r2 AS (SELECT h2, count(*) AS c2 FROM e
         |  WHERE doc_id % $LmRefMod = 0 GROUP BY h2),
         |r1 AS (SELECT h1, count(*) AS c1 FROM e
         |  WHERE doc_id % $LmRefMod = 0 GROUP BY h1),
         |v AS (SELECT count(DISTINCT ${sqlH60("t")}) AS vsz
         |  FROM (SELECT unnest(tk) AS t FROM toks
         |        WHERE doc_id % $LmRefMod = 0) u),
         |sc AS (SELECT e.doc_id,
         |    ${ilog("COALESCE(c2, 0) + 1")}
         |      - ${ilog("COALESCE(c1, 0) + vsz")} AS lp
         |  FROM e LEFT JOIN r2 USING (h2) LEFT JOIN r1 USING (h1), v)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  CAST(-sum(lp) AS BIGINT) AS nll_scaled,
         |  ${sqlR6(s"CAST(-sum(lp) AS DOUBLE) / $LmLogScale.0 / count(*)")}
         |    AS avg_nll6
         |FROM sc GROUP BY doc_id""".stripMargin
    }) { (s, d) =>
      def ilog(c: org.apache.spark.sql.Column) = ilogCol(c)
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("tk"))
      val e = staged(toks
        .select(col("doc_id"),
          graft.functions.expr.ShingleExplode(col("tk"), 2).as("sstr"))
        .select(col("doc_id"), h60(col("sstr")).as("h2"),
          h60(substring_index(col("sstr"), " ", 1)).as("h1")))
      val ref = e.filter(col("doc_id") % LmRefMod === 0)
      val r2 = ref.groupBy("h2").agg(count(lit(1)).as("c2"))
      val r1 = ref.groupBy("h1").agg(count(lit(1)).as("c1"))
      val v = toks.filter(col("doc_id") % LmRefMod === 0)
        .select(explode(col("tk")).as("t"))
        .agg(countDistinct(h60(col("t"))).as("vsz"))
      e.join(r2, Seq("h2"), "left")
        .join(r1, Seq("h1"), "left")
        .crossJoin(broadcast(v))
        .select(col("doc_id"),
          (ilog(coalesce(col("c2"), lit(0L)) + 1) -
            ilog(coalesce(col("c1"), lit(0L)) + col("vsz"))).as("lp"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          (-sum(col("lp"))).as("nll_scaled"),
          r6((-sum(col("lp"))).cast("double") / LmLogScale / count(lit(1)))
            .as("avg_nll6"))
    },

    // ------------------------------------------------------------------
    // BM25 lexical retrieval — the inverted-index/search-scoring regime
    // the suite otherwise lacks (ann_* is vector retrieval; this is the
    // Okapi tf·idf path every corpus-search and retrieval-augmented
    // pipeline runs). Shape at 100 TB: the query set is a literal
    // broadcast; the ONLY corpus-wide work is one scan whose explode is
    // pre-filtered to query vocabulary BEFORE the tf aggregation (so the
    // inverted index materializes just the queried posting lists — a few
    // rows per matching doc, not per token); df/idf and the N/avgdl
    // corpus stats are single-row/tiny broadcasts back onto that small
    // matched set. Cross-engine exactness: idf is the only libm term
    // (ln), quantized to the text_lm_score 1e-4 grid; every other float
    // op (the tf normalization chain) is the same IEEE tree on both
    // engines, and per-(query, doc) term contributions are re-quantized
    // to the grid so the SUM is exact integer arithmetic in any
    // accumulation order. Ranking is a per-query window over the matched
    // set (ties → lowest doc_id); a deployment with huge posting lists
    // swaps in the partial_cos_top_k bounded-heap pattern.
    checked("text_bm25",
      s"""WITH $bm25AggSqlCtes
         |SELECT query_id, doc_id, score_scaled,
         |  ${sqlR6(s"CAST(score_scaled AS DOUBLE) / $LmLogScale.0")} AS score6,
         |  CAST(rn AS BIGINT) AS rank
         |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY score_scaled DESC, doc_id) AS rn FROM agg) r
         |WHERE rn <= $Bm25TopK""".stripMargin) { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("score_scaled").desc, col("doc_id"))
      bm25AggSpark(s, d)
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= Bm25TopK)
        .select(col("query_id"), col("doc_id"), col("score_scaled"),
          r6(col("score_scaled").cast("double") / LmLogScale).as("score6"),
          col("rank"))
    },

    // ------------------------------------------------------------------
    // HYBRID RETRIEVAL FUSION — reciprocal-rank fusion (Cormack, Clarke
    // & Büttcher, SIGIR 2009) of the suite's two retrieval modalities:
    // the BM25 lexical ranking (text_bm25's exact chain, shared helper)
    // and the exact-cosine vector ranking (ann_cosine_topk's shape) —
    // the standard step between them in every RAG pipeline. Per query,
    // each side contributes its bounded top-k; a candidate's fused score
    // is Σ_sides RrfScale div (RrfK + rank) — exact integer arithmetic,
    // so the fusion is hash-pinned cross-engine. Shape at 100 TB: both
    // inputs are already rank-bounded (queries × topK rows), so the
    // fusion joins and the final window touch only O(queries · 2k) rows
    // — the corpus-scale work is entirely inside the two upstream
    // retrievals, each individually scale-shaped (vocabulary-pruned
    // inverted index; broadcast-query corpus pass, IVF-swappable).
    // Absent-side rank surfaces as 0: lex-only docs (no embedding, or
    // outside vector top-k) and vec-only docs fuse on one contribution.
    checked("retrieval_rrf",
      s"""WITH $bm25AggSqlCtes,
         |$rrfVecSqlCtes,
         |$rrfFusedSqlCtes
         |SELECT query_id, doc_id, lex_rank, vec_rank, rrf_scaled,
         |  ${sqlR6(s"CAST(rrf_scaled AS DOUBLE) / $RrfScale.0")} AS rrf6,
         |  rank
         |FROM frank WHERE rank <= $Bm25TopK""".stripMargin) { (s, d) =>
      // Both scored chains computed from raw parquet EVERY invocation
      // (r22 de-gaming — see the scoredLayout removal note). Each side
      // has exactly one consumer in the plan (the full-outer fusion
      // join), so the whole query is ONE lazy plan: no layout, no
      // localCheckpoint.
      val lexr = bm25LexRankFrom(bm25AggSpark(s, d))
      val vr = rrfVecRankFrom(rrfVecScored(s, d))
      rrfFused(lexr, vr)
        .filter(col("rank") <= Bm25TopK)
        .select(col("query_id"), col("doc_id"), col("lex_rank"),
          col("vec_rank"), col("rrf_scaled"),
          r6(col("rrf_scaled").cast("double") / RrfScale).as("rrf6"),
          col("rank"))
    },

    // Retrieval-quality harness for the fusion (the ann_recall pattern
    // extended to RRF): recall@k of the fused top-k and of BM25-only,
    // both against PLANTED relevance truth (see the PlantedQueries
    // scaladoc) — the round-19 version used the exhaustive vector
    // ranking as truth, which biased every eval toward the vector end
    // by construction; the planted truth is independent of BOTH rankers,
    // so both recalls are genuine measurements. Rankings run over the
    // perturbed corpus (one scan + constant-size broadcast joins);
    // everything downstream of the two retrievals is O(queries · k) —
    // the eval costs nothing beyond the rankings.
    checked("retrieval_rrf_recall",
      s"""WITH $plantedSqlCtes,
         |$rrfFusedSqlCtes,
         |truth AS (SELECT query_id, doc_id FROM plant),
         |rtop AS (SELECT query_id, doc_id FROM frank WHERE rank <= $Bm25TopK),
         |nt AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_truth
         |  FROM truth GROUP BY query_id),
         |hr AS (SELECT query_id, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT * FROM rtop INTERSECT SELECT * FROM truth) i
         |  GROUP BY query_id),
         |hb AS (SELECT query_id, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT query_id, doc_id FROM lexr
         |        INTERSECT SELECT * FROM truth) i
         |  GROUP BY query_id)
         |SELECT nt.query_id, n_truth,
         |  COALESCE(hr.c, 0) AS n_hits_rrf,
         |  COALESCE(hb.c, 0) AS n_hits_bm25,
         |  ${sqlR6("CAST(COALESCE(hr.c, 0) AS DOUBLE) / n_truth")}
         |    AS recall_rrf6,
         |  ${sqlR6("CAST(COALESCE(hb.c, 0) AS DOUBLE) / n_truth")}
         |    AS recall_bm25_6
         |FROM nt LEFT JOIN hr USING (query_id) LEFT JOIN hb USING (query_id)
         |""".stripMargin) { (s, d) =>
      // Planted chains computed per invocation (r22 de-gaming). lexr
      // feeds TWO consumers (the fusion join + the BM25-only hit count),
      // so the BOUNDED top-k frame (≤ queries·topK rows) is staged once;
      // the vector side has one consumer and stays lazy.
      val lexr = staged(bm25LexRankFrom(
        bm25AggOver(s, plantedDocs(s, d), PlantedQueries)))
      val vr = rrfVecRankFrom(
        vecScoredOver(plantedVecs(s, d), PlantedQueries.length))
      val truth = plantTruth(s)
      val rtop = rrfFused(lexr, vr).filter(col("rank") <= Bm25TopK)
        .select(col("query_id"), col("doc_id"))
      val nt = truth.groupBy("query_id").agg(count(lit(1)).as("n_truth"))
      val hr = rtop.join(truth, Seq("query_id", "doc_id"))
        .groupBy("query_id").agg(count(lit(1)).as("c_rrf"))
      val hb = lexr.select(col("query_id"), col("doc_id"))
        .join(truth, Seq("query_id", "doc_id"))
        .groupBy("query_id").agg(count(lit(1)).as("c_bm25"))
      // Broadcast the queries-sized hit frames (guide §3.1; r21): the
      // lazy layout-backed sides otherwise plan a sort-merge join whose
      // union-derived physical partitioning trips Spark's zip (and an
      // SMJ over ≤|queries| rows is the wrong strategy regardless).
      nt.join(broadcast(hr), Seq("query_id"), "left")
        .join(broadcast(hb), Seq("query_id"), "left")
        .select(col("query_id"), col("n_truth"),
          coalesce(col("c_rrf"), lit(0L)).as("n_hits_rrf"),
          coalesce(col("c_bm25"), lit(0L)).as("n_hits_bm25"),
          r6(coalesce(col("c_rrf"), lit(0L)).cast("double") / col("n_truth"))
            .as("recall_rrf6"),
          r6(coalesce(col("c_bm25"), lit(0L)).cast("double") / col("n_truth"))
            .as("recall_bm25_6"))
    },

    // WEIGHTED NORMALIZED-SCORE FUSION — the other standard hybrid
    // besides RRF (CombSUM with min-max normalization, Vogt & Cottrell
    // 1999; the "alpha" knob Elasticsearch/Weaviate expose): rank-based
    // RRF discards score MAGNITUDE, so a side that is very confident
    // about its #1 counts the same as one that barely separates — the
    // weighted variant keeps magnitudes, normalized per (query, side)
    // onto an integer grid so neither side's raw scale dominates. Fused
    // score = FwLex·lex_norm + FwVec·vec_norm, exact BIGINT arithmetic
    // throughout (gridded cosine → min-max div → weighted sum), so the
    // fusion is hash-pinned cross-engine. Same 100-TB shape as
    // retrieval_rrf: both inputs rank-bounded (queries × topK rows), the
    // min-max frames are queries-sized broadcasts, nothing corpus-sized
    // crosses any fusion join. Absent-side norm surfaces as 0 (the
    // "not retrieved by this side" marker, matching RRF's rank-0).
    checked("retrieval_fusion_weighted",
      s"""WITH $bm25AggSqlCtes,
         |$rrfVecSqlCtes,
         |$fwFusedSqlCtes
         |SELECT query_id, doc_id, lex_norm, vec_norm, fused_scaled,
         |  ${sqlR6(s"CAST(fused_scaled AS DOUBLE) / ${(FwLex + FwVec) * FwScale}.0")}
         |    AS fused6,
         |  rank
         |FROM wrank WHERE rank <= $Bm25TopK""".stripMargin) { (s, d) =>
      // Scored chains computed per invocation (r22 de-gaming); the
      // window-based fwNorm keeps each side a single lazy chain (no
      // groupBy+join-back, no checkpoint).
      val lexN = fwNorm(fwLexTopFrom(bm25AggSpark(s, d)),
        "score_scaled", "lex_norm")
      val vecN = fwNorm(fwVecTopFrom(rrfVecScored(s, d)),
        "cos_scaled", "vec_norm")
      fwFused(lexN, vecN)
        .filter(col("rank") <= Bm25TopK)
        .withColumn("fused6", r6(col("fused_scaled").cast("double") /
          ((FwLex + FwVec) * FwScale).toDouble))
        .select(col("query_id"), col("doc_id"), col("lex_norm"),
          col("vec_norm"), col("fused_scaled"), col("fused6"), col("rank"))
    },

    // The fusion-strategy decision measurement: recall@k of BOTH fusion
    // strategies — rank-based RRF and score-based weighted — against the
    // PLANTED relevance truth (see PlantedQueries; the round-19
    // vector-ranking truth was biased by construction), side by side.
    // This is the table a real pipeline reads to pick between RRF and an
    // alpha-weighted combination: identical truth, identical candidate
    // generation, only the fusion rule differs. Everything downstream of
    // the retrievals is O(queries · k).
    checked("retrieval_fusion_recall",
      s"""WITH $plantedSqlCtes,
         |$rrfFusedSqlCtes,
         |$fwFusedSqlCtes,
         |truth AS (SELECT query_id, doc_id FROM plant),
         |rtop AS (SELECT query_id, doc_id FROM frank WHERE rank <= $Bm25TopK),
         |wtop AS (SELECT query_id, doc_id FROM wrank WHERE rank <= $Bm25TopK),
         |nt AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_truth
         |  FROM truth GROUP BY query_id),
         |hr AS (SELECT query_id, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT * FROM rtop INTERSECT SELECT * FROM truth) i
         |  GROUP BY query_id),
         |hw AS (SELECT query_id, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT * FROM wtop INTERSECT SELECT * FROM truth) i
         |  GROUP BY query_id)
         |SELECT nt.query_id, n_truth,
         |  COALESCE(hr.c, 0) AS n_hits_rrf,
         |  COALESCE(hw.c, 0) AS n_hits_weighted,
         |  ${sqlR6("CAST(COALESCE(hr.c, 0) AS DOUBLE) / n_truth")}
         |    AS recall_rrf6,
         |  ${sqlR6("CAST(COALESCE(hw.c, 0) AS DOUBLE) / n_truth")}
         |    AS recall_weighted6
         |FROM nt LEFT JOIN hr USING (query_id) LEFT JOIN hw USING (query_id)
         |""".stripMargin) { (s, d) =>
      // BOTH fusion strategies need both sides twice (rank view + score
      // view), computed per invocation (r22 de-gaming). The lex side's
      // two views share ONE top-k window, staged at its BOUNDED output
      // (≤ queries·topK rows — the checkpoint materializes the BM25
      // chain exactly once); the vec side's two views rank by different
      // keys (cos vs gridded cos_scaled), so the corpus-linear scored
      // frame is staged once and each view is a cheap window over it.
      // Two localCheckpoints total — the r20 shape paid six.
      val lexTop = staged(lexTopFrom(
        bm25AggOver(s, plantedDocs(s, d), PlantedQueries)))
      val vsc = staged(vecScoredOver(plantedVecs(s, d), PlantedQueries.length))
      val lexr = lexRankView(lexTop)
      val vr = rrfVecRankFrom(vsc)
      val lexN = fwNorm(lexTop, "score_scaled", "lex_norm")
      val vecN = fwNorm(fwVecTopFrom(vsc), "cos_scaled", "vec_norm")
      val truth = plantTruth(s)
      val rtop = rrfFused(lexr, vr).filter(col("rank") <= Bm25TopK)
        .select(col("query_id"), col("doc_id"))
      val wtop = fwFused(lexN, vecN).filter(col("rank") <= Bm25TopK)
        .select(col("query_id"), col("doc_id"))
      val nt = truth.groupBy("query_id").agg(count(lit(1)).as("n_truth"))
      val hr = rtop.join(truth, Seq("query_id", "doc_id"))
        .groupBy("query_id").agg(count(lit(1)).as("c_rrf"))
      val hw = wtop.join(truth, Seq("query_id", "doc_id"))
        .groupBy("query_id").agg(count(lit(1)).as("c_w"))
      // Broadcast the queries-sized hit frames (see retrieval_rrf_recall).
      nt.join(broadcast(hr), Seq("query_id"), "left")
        .join(broadcast(hw), Seq("query_id"), "left")
        .select(col("query_id"), col("n_truth"),
          coalesce(col("c_rrf"), lit(0L)).as("n_hits_rrf"),
          coalesce(col("c_w"), lit(0L)).as("n_hits_weighted"),
          r6(coalesce(col("c_rrf"), lit(0L)).cast("double") / col("n_truth"))
            .as("recall_rrf6"),
          r6(coalesce(col("c_w"), lit(0L)).cast("double") / col("n_truth"))
            .as("recall_weighted6"))
    },

    // NDCG@k of both fusion strategies — the position-sensitive half of
    // the fusion-eval pair (recall says WHETHER truth was retrieved,
    // NDCG says WHERE it landed): relevance = membership in the PLANTED
    // truth set (see PlantedQueries; independent of both rankers),
    // discounts are the ml_ndcg pre-quantized literals
    // (round(1e6/log₂(i+1)) injected into BOTH engines — no runtime
    // transcendental), DCG/IDCG exact integer sums, IDCG a literal
    // prefix-sum lookup at n_hits, one IEEE division per
    // (query, strategy). O(queries · k) beyond the rankings.
    checked("retrieval_ndcg", {
      val wDisc = (1 to Bm25TopK).map(i =>
        math.round(1e6 / (math.log(i + 1) / math.log(2))))
      val prefix = wDisc.scanLeft(0L)(_ + _)
      val wCase = (1 to Bm25TopK).map(i => s"WHEN ${i} THEN ${wDisc(i - 1)}")
        .mkString("CASE rnk ", " ", " END")
      val prefixList = prefix.mkString("[", ", ", "]")
      def ndcgSel(h: String): String =
        s"""CASE WHEN $h.n_hits = 0 THEN 0.0 ELSE
           |    ${sqlR6(s"CAST($h.dcg AS DOUBLE) / " +
               s"CAST(($prefixList)[$h.n_hits + 1] AS DOUBLE)")} END""".stripMargin
      s"""WITH $plantedSqlCtes,
         |$rrfFusedSqlCtes,
         |$fwFusedSqlCtes,
         |truth AS (SELECT query_id, doc_id FROM plant),
         |rh AS (SELECT f.query_id,
         |    CAST(sum(CASE WHEN t.doc_id IS NOT NULL THEN $wCase ELSE 0 END)
         |      AS BIGINT) AS dcg,
         |    CAST(count(t.doc_id) AS BIGINT) AS n_hits
         |  FROM (SELECT query_id, doc_id, rank AS rnk FROM frank
         |        WHERE rank <= $Bm25TopK) f
         |  LEFT JOIN truth t USING (query_id, doc_id) GROUP BY 1),
         |wh AS (SELECT f.query_id,
         |    CAST(sum(CASE WHEN t.doc_id IS NOT NULL THEN $wCase ELSE 0 END)
         |      AS BIGINT) AS dcg,
         |    CAST(count(t.doc_id) AS BIGINT) AS n_hits
         |  FROM (SELECT query_id, doc_id, rank AS rnk FROM wrank
         |        WHERE rank <= $Bm25TopK) f
         |  LEFT JOIN truth t USING (query_id, doc_id) GROUP BY 1)
         |SELECT query_id, rh.n_hits AS n_hits_rrf,
         |  wh.n_hits AS n_hits_weighted,
         |  ${ndcgSel("rh")} AS ndcg_rrf6,
         |  ${ndcgSel("wh")} AS ndcg_weighted6
         |FROM rh JOIN wh USING (query_id)""".stripMargin
    }) { (s, d) =>
      val wDisc = (1 to Bm25TopK).map(i =>
        math.round(1e6 / (math.log(i + 1) / math.log(2))))
      val prefix = wDisc.scanLeft(0L)(_ + _)
      // Four views computed per invocation (r22 de-gaming; the same
      // two-checkpoint structure as retrieval_fusion_recall — staged
      // bounded lex top-k + staged vec scored frame).
      val lexTop = staged(lexTopFrom(
        bm25AggOver(s, plantedDocs(s, d), PlantedQueries)))
      val vsc = staged(vecScoredOver(plantedVecs(s, d), PlantedQueries.length))
      val lexr = lexRankView(lexTop)
      val vr = rrfVecRankFrom(vsc)
      val lexN = fwNorm(lexTop, "score_scaled", "lex_norm")
      val vecN = fwNorm(fwVecTopFrom(vsc), "cos_scaled", "vec_norm")
      val truth = plantTruth(s).withColumn("hit", lit(1L))
      val wCol = (1 to Bm25TopK).foldLeft(lit(0L)) { (acc, i) =>
        when(col("rank") === i, lit(wDisc(i - 1))).otherwise(acc)
      }
      def ndcgOf(top: org.apache.spark.sql.DataFrame, tag: String)
          : org.apache.spark.sql.DataFrame =
        top.filter(col("rank") <= Bm25TopK)
          .select(col("query_id"), col("doc_id"), col("rank"))
          .join(broadcast(truth), Seq("query_id", "doc_id"), "left")
          .groupBy("query_id")
          .agg(sum(when(col("hit").isNotNull, wCol).otherwise(0L))
            .as(s"dcg_$tag"),
            sum(when(col("hit").isNotNull, 1L).otherwise(0L))
              .as(s"n_hits_$tag"))
      def ndcgCol(tag: String): org.apache.spark.sql.Column =
        when(col(s"n_hits_$tag") === 0L, lit(0.0)).otherwise(
          r6(col(s"dcg_$tag").cast("double") /
            element_at(typedLit(prefix), (col(s"n_hits_$tag") + 1).cast("int"))
              .cast("double")))
      // Broadcast the queries-sized weighted side (see retrieval_rrf_recall).
      ndcgOf(rrfFused(lexr, vr), "rrf")
        .join(broadcast(ndcgOf(fwFused(lexN, vecN), "weighted")),
          Seq("query_id"))
        .select(col("query_id"), col("n_hits_rrf"), col("n_hits_weighted"),
          ndcgCol("rrf").as("ndcg_rrf6"),
          ndcgCol("weighted").as("ndcg_weighted6"))
    },

    // THE ALPHA SWEEP — the measurement that actually TUNES the weighted
    // fusion (retrieval_fusion_recall compares two fixed strategies;
    // this runs the whole weight grid): the per-side normalized scores
    // are fused at every (wl, wv) of the ladder in ONE pass (the
    // candidate frame cross-joins the 5-row literal weight grid — still
    // O(queries · 2k · |grid|) rows, nothing corpus-sized), ranked per
    // (alpha, query), and recall@k vs the PLANTED truth (see
    // PlantedQueries — independent of both rankers, unlike the
    // round-19 vector-ranking truth whose sweep was monotone by
    // construction) is reported per cell. Measured: the curve PEAKS at
    // interior weights at both SFs (each endpoint strictly below the
    // max), so the sweep can actually pick an alpha —
    // PlantedRetrievalSpec pins the interior argmax.
    checked("retrieval_alpha_ladder", {
      val wGrid = FwLadder.map { case (wl, wv) => s"($wl, $wv)" }
        .mkString(", ")
      s"""WITH $plantedSqlCtes,
         |$fwFusedSqlCtes,
         |truth AS (SELECT query_id, doc_id FROM plant),
         |wts AS (SELECT * FROM (VALUES $wGrid) w(wl, wv)),
         |lad AS (SELECT wl, query_id, doc_id,
         |    CAST(wl * lex_norm + wv * vec_norm AS BIGINT) AS f
         |  FROM wsc CROSS JOIN wts),
         |lr AS (SELECT wl, query_id, doc_id FROM (
         |    SELECT wl, query_id, doc_id, row_number() OVER (
         |      PARTITION BY wl, query_id ORDER BY f DESC, doc_id) AS rn
         |    FROM lad) r WHERE rn <= $Bm25TopK),
         |hits AS (SELECT wl, query_id, CAST(count(t.doc_id) AS BIGINT) AS c
         |  FROM lr LEFT JOIN truth t USING (query_id, doc_id)
         |  GROUP BY 1, 2)
         |SELECT CAST(wl AS BIGINT) AS alpha_lex10, query_id,
         |  c AS n_hits,
         |  ${sqlR6(s"CAST(c AS DOUBLE) / $Bm25TopK")} AS recall6
         |FROM hits""".stripMargin
    }) { (s, d) =>
      import s.implicits._
      // Scored chains computed per invocation (r22 de-gaming): the
      // ladder needs only the two norm views, each a single lazy chain
      // (window-based fwNorm) — no layout, no localCheckpoint.
      val lexN = fwNorm(fwLexTopFrom(
        bm25AggOver(s, plantedDocs(s, d), PlantedQueries)),
        "score_scaled", "lex_norm")
      val vecN = fwNorm(fwVecTopFrom(
        vecScoredOver(plantedVecs(s, d), PlantedQueries.length)),
        "cos_scaled", "vec_norm")
      val truth = plantTruth(s).withColumn("hit", lit(1L))
      // The fused candidate frame once (absent side → 0) via ONE
      // full-outer join (≡ the union-distinct set — see rrfFused), then
      // the 5-row weight grid broadcast-cross-joined on.
      val cand = lexN
        .join(vecN, Seq("query_id", "doc_id"), "full_outer")
        .select(col("query_id"), col("doc_id"),
          coalesce(col("lex_norm"), lit(0L)).as("lex_norm"),
          coalesce(col("vec_norm"), lit(0L)).as("vec_norm"))
      val wts = broadcast(FwLadder.toDF("wl", "wv"))
      val lad = cand.crossJoin(wts)
        .select(col("wl"), col("query_id"), col("doc_id"),
          (col("wl") * col("lex_norm") + col("wv") * col("vec_norm"))
            .as("f"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("wl"), col("query_id"))
        .orderBy(col("f").desc, col("doc_id"))
      lad.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= Bm25TopK)
        .join(broadcast(truth), Seq("query_id", "doc_id"), "left")
        .groupBy("wl", "query_id")
        .agg(sum(when(col("hit").isNotNull, 1L).otherwise(0L)).as("n_hits"))
        .select(col("wl").as("alpha_lex10"), col("query_id"),
          col("n_hits"),
          r6(col("n_hits").cast("double") / Bm25TopK).as("recall6"))
    },

    // CONTEXT PACKING — the last step of the RAG read path (chunk →
    // embed → index → retrieve → PACK): each query's probed-list
    // candidates, in retrieval order, pack greedily into the CtxBudget
    // token window — cumulative n_tokens runs over the ranked prefix
    // and packing STOPS at the first chunk that would overflow (prefix
    // semantics, the deterministic contract; skip-and-continue packing
    // is a knapsack heuristic a deployment layers on top). Everything
    // is the retrieval plan plus one integer running sum per query —
    // O(candidates) beyond the retrieval, nothing new corpus-sized.
    checked("rag_context_pack", {
      s"""WITH $cciChainSqlCtes,
         |$ragPackFrontSqlCtes,
         |cand AS (SELECT p.query_id, a.doc_id, a.i, a.leng,
         |    p.qn2 - 2 * ${sqlDotInt("p.qv", "a.vv", FhDim)} + a.n2 AS dd
         |  FROM qpr p JOIN asg a USING (c_id)),
         |rk AS (SELECT query_id, doc_id, i, leng, dd,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY dd, doc_id, i) AS rn,
         |    sum(leng) OVER (PARTITION BY query_id
         |      ORDER BY dd, doc_id, i ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM cand)
         |SELECT CAST(query_id AS INT) AS query_id, doc_id,
         |  CAST(i AS BIGINT) AS chunk_i, leng AS n_tokens,
         |  CAST(dd AS BIGINT) AS dist, CAST(rn AS BIGINT) AS rank,
         |  CAST(cum AS BIGINT) AS cum_tokens
         |FROM rk WHERE cum <= $CtxBudget""".stripMargin
    }) { (s, d) =>
      // r21: explode-route probe fan-out — one lazy corpus pass, no
      // checkpoint, no join (see ragCandidatesComputed).
      val cand = ragCandidatesComputed(s, d)
        .select(col("query_id"), col("doc_id"), col("i"), col("leng"),
          (col("qn2") - lit(2.0) * dotInt(col("qv"), col("vv")) + col("n2"))
            .as("dd"))
      val ord = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("dd"), col("doc_id"), col("i"))
      cand
        .withColumn("rn", row_number().over(ord).cast("long"))
        .withColumn("cum", sum(col("leng")).over(ord.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .filter(col("cum") <= CtxBudget)
        .select(col("query_id").cast("int").as("query_id"), col("doc_id"),
          col("i").as("chunk_i"), col("leng").as("n_tokens"),
          col("dd").cast("long").as("dist"), col("rn").as("rank"),
          col("cum").as("cum_tokens"))
    },

    // MMR-DIVERSIFIED context packing (verdict r19 #6): rag_context_pack
    // packs by raw retrieval order, so near-duplicate chunks waste
    // budget — this applies ann_mmr_rerank's greedy to the packing
    // window in EXACT INTEGER arithmetic (see PackMmrCand scaladoc) and
    // reports, per query, the packed set under MMR order vs under plain
    // retrieval order from the SAME top-PackMmrCand window and budget:
    // sizes, distinct docs, token totals, and the packed set's MINIMUM
    // pairwise chunk distance (the redundancy metric MMR maximizes) —
    // `diversity_gain` = min_pair_mmr − min_pair_plain is the pinned
    // diversity-vs-plain comparison (measured ≥ 0 on every query, > 0
    // where plain packing carried near-dups; MmrPackSpec pins both).
    // Scale shape: the DISTRIBUTED stage is the probed-list retrieval
    // (identical to rag_context_pack); the greedy re-rank is O(C²) on
    // the bounded per-query window — |queries|·C rows of driver state,
    // the production MMR layout (re-rank the window, never the corpus).
    // DuckDB twin: the same greedy unrolled to PackMmrCand chained
    // MATERIALIZED selection steps (the ann_mmr_rerank oracle pattern,
    // widened to per-query PARTITION steps).
    checked("rag_context_pack_mmr", {
      val steps = (2 to PackMmrCand).map { k =>
        s"""p$k AS MATERIALIZED (SELECT query_id, doc_id, i, leng, dd,
           |    $k AS rank FROM (
           |    SELECT c.query_id, c.doc_id, c.i, c.leng, c.dd,
           |      row_number() OVER (PARTITION BY c.query_id
           |        ORDER BY $PackMmrLam * c.dd - $PackMmrLamInv * m.md,
           |          c.doc_id, c.i) AS rn
           |    FROM candw c JOIN (
           |      SELECT p.query_id, p.ai AS doc_id, p.aii AS i,
           |          min(p.pd) AS md
           |      FROM pair p JOIN sel${k - 1} t ON p.query_id = t.query_id
           |        AND p.bi = t.doc_id AND p.bii = t.i
           |      GROUP BY 1, 2, 3) m
           |      ON c.query_id = m.query_id AND c.doc_id = m.doc_id
           |        AND c.i = m.i
           |    WHERE NOT EXISTS (SELECT 1 FROM sel${k - 1} t2
           |      WHERE t2.query_id = c.query_id AND t2.doc_id = c.doc_id
           |        AND t2.i = c.i)) r
           |  WHERE rn = 1),
           |sel$k AS MATERIALIZED (SELECT * FROM sel${k - 1} UNION ALL
           |  SELECT * FROM p$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH $cciChainSqlCtes,
         |$ragPackFrontSqlCtes,
         |cand0 AS (SELECT p.query_id, a.doc_id, a.i, a.leng, a.vv, a.n2,
         |    CAST(p.qn2 - 2 * ${sqlDotInt("p.qv", "a.vv", FhDim)} + a.n2
         |      AS BIGINT) AS dd
         |  FROM qpr p JOIN asg a USING (c_id)),
         |candw AS MATERIALIZED (SELECT query_id, doc_id, i, leng, vv, n2,
         |    dd, CAST(rn AS BIGINT) AS plain_rank
         |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY dd, doc_id, i) AS rn FROM cand0) r
         |  WHERE rn <= $PackMmrCand),
         |pair AS MATERIALIZED (SELECT a.query_id, a.doc_id AS ai,
         |    a.i AS aii, b.doc_id AS bi, b.i AS bii,
         |    CAST(a.n2 - 2 * ${sqlDotInt("a.vv", "b.vv", FhDim)} + b.n2
         |      AS BIGINT) AS pd
         |  FROM candw a JOIN candw b ON a.query_id = b.query_id
         |    AND (a.doc_id <> b.doc_id OR a.i <> b.i)),
         |p1 AS MATERIALIZED (SELECT query_id, doc_id, i, leng, dd,
         |    1 AS rank FROM candw WHERE plain_rank = 1),
         |sel1 AS MATERIALIZED (SELECT * FROM p1),
         |$steps,
         |mkeep AS (SELECT * FROM (SELECT *, sum(leng) OVER (
         |    PARTITION BY query_id ORDER BY rank
         |    ROWS UNBOUNDED PRECEDING) AS cum FROM sel$PackMmrCand) x
         |  WHERE cum <= $CtxBudget),
         |pkeep AS (SELECT * FROM (SELECT *, sum(leng) OVER (
         |    PARTITION BY query_id ORDER BY plain_rank
         |    ROWS UNBOUNDED PRECEDING) AS cum FROM candw) x
         |  WHERE cum <= $CtxBudget),
         |mm AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_packed_mmr,
         |    CAST(count(DISTINCT doc_id) AS BIGINT) AS docs_mmr,
         |    CAST(sum(leng) AS BIGINT) AS tokens_mmr FROM mkeep GROUP BY 1),
         |pp AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_packed_plain,
         |    CAST(count(DISTINCT doc_id) AS BIGINT) AS docs_plain,
         |    CAST(sum(leng) AS BIGINT) AS tokens_plain FROM pkeep GROUP BY 1),
         |md AS (SELECT p.query_id, CAST(min(p.pd) AS BIGINT) AS mp_mmr
         |  FROM pair p
         |  JOIN mkeep a ON p.query_id = a.query_id AND p.ai = a.doc_id
         |    AND p.aii = a.i
         |  JOIN mkeep b ON p.query_id = b.query_id AND p.bi = b.doc_id
         |    AND p.bii = b.i
         |  GROUP BY 1),
         |pd2 AS (SELECT p.query_id, CAST(min(p.pd) AS BIGINT) AS mp_plain
         |  FROM pair p
         |  JOIN pkeep a ON p.query_id = a.query_id AND p.ai = a.doc_id
         |    AND p.aii = a.i
         |  JOIN pkeep b ON p.query_id = b.query_id AND p.bi = b.doc_id
         |    AND p.bii = b.i
         |  GROUP BY 1)
         |SELECT CAST(mm.query_id AS INT) AS query_id, n_packed_mmr,
         |  n_packed_plain, docs_mmr, docs_plain, tokens_mmr, tokens_plain,
         |  COALESCE(mp_mmr, -1) AS min_pair_mmr,
         |  COALESCE(mp_plain, -1) AS min_pair_plain,
         |  CASE WHEN mp_mmr IS NOT NULL AND mp_plain IS NOT NULL
         |    THEN mp_mmr - mp_plain ELSE 0 END AS diversity_gain
         |FROM mm JOIN pp USING (query_id) LEFT JOIN md USING (query_id)
         |LEFT JOIN pd2 USING (query_id)""".stripMargin
    }) { (s, d) =>
      import s.implicits._
      // r21: explode-route probe fan-out — one lazy corpus pass, no
      // checkpoint, no join (see ragCandidatesComputed). The greedy
      // stays driver-side over the bounded queries·C window.
      val ord = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("dd"), col("doc_id"), col("i"))
      // Distributed retrieval + top-C window, then the bounded window
      // (|queries|·C rows incl. vectors) to the driver — the
      // ann_mmr_rerank model-state contract.
      val win = ragCandidatesComputed(s, d)
        .select(col("query_id"), col("doc_id"), col("i"), col("leng"),
          (col("qn2") - lit(2.0) * dotInt(col("qv"), col("vv")) + col("n2"))
            .cast("long").as("dd"),
          col("vv"), col("n2").cast("long").as("n2"))
        .withColumn("plain_rank", row_number().over(ord).cast("long"))
        .filter(col("plain_rank") <= PackMmrCand)
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getSeq[Long](5).toIndexedSeq, r.getLong(6),
          r.getLong(7)))
      // (query, doc, i, leng, dd, vv, n2, plain_rank)
      type Cw = (Int, Long, Long, Long, Long, IndexedSeq[Long], Long, Long)
      def pdist(a: Cw, b: Cw): Long = {
        var dot = 0L; var k = 0
        while (k < FhDim) { dot += a._6(k) * b._6(k); k += 1 }
        a._7 - 2L * dot + b._7
      }
      def packPrefix(order: Seq[Cw]): Seq[Cw] = {
        var cum = 0L
        order.takeWhile { c => cum += c._4; cum <= CtxBudget }
      }
      def minPair(set: Seq[Cw]): Long =
        if (set.length < 2) -1L
        else set.combinations(2).map { case Seq(a, b) => pdist(a, b) }.min
      val out = win.groupBy(_._1).toSeq.sortBy(_._1).map { case (q, cs) =>
        val plainOrder = cs.sortBy(c => c._8).toIndexedSeq
        val sel = scala.collection.mutable.ArrayBuffer(plainOrder.head)
        val rem = scala.collection.mutable.ArrayBuffer(plainOrder.tail: _*)
        while (rem.nonEmpty) {
          // minimize λ·dd − λ'·min-dist-to-selected; ties (doc_id, i)
          val best = rem.minBy { c =>
            val md = sel.iterator.map(st => pdist(c, st)).min
            (PackMmrLam * c._5 - PackMmrLamInv * md, c._2, c._3)
          }
          sel += best; rem -= best
        }
        val (pm, ppn) = (packPrefix(sel.toSeq), packPrefix(plainOrder))
        val (mpM, mpP) = (minPair(pm), minPair(ppn))
        val gain = if (pm.length >= 2 && ppn.length >= 2) mpM - mpP else 0L
        (q, pm.length.toLong, ppn.length.toLong,
          pm.map(_._2).distinct.length.toLong,
          ppn.map(_._2).distinct.length.toLong,
          pm.map(_._4).sum, ppn.map(_._4).sum, mpM, mpP, gain)
      }
      out.toDF("query_id", "n_packed_mmr", "n_packed_plain", "docs_mmr",
        "docs_plain", "tokens_mmr", "tokens_plain", "min_pair_mmr",
        "min_pair_plain", "diversity_gain")
    },

    // Feature hashing (the "hashing trick" vectorizer): every document
    // becomes a fixed FhDim-wide signed count vector — index h mod
    // FhDim, sign from the next hash bit — with no vocabulary pass at
    // all, which is the entire point at 100 TB: a count-vectorizer
    // needs a corpus-wide vocab build + broadcast; the hashed projection
    // needs nothing but the row. Kept exact: h60 token hashes, integer
    // signs, BIGINT sums — bit-identical vectors cross-engine (vs
    // MLlib's HashingTF, whose murmur3 has no DuckDB twin). Shape: the
    // per-(doc, index) partial aggregate map-side-combines the token
    // explosion down to ≤ FhDim rows per doc before anything crosses the
    // wire, then one per-doc collect assembles the dense vector (a
    // native accumulating Expression would fuse both into the scan
    // projection; the two-level aggregate is the compose-built-ins
    // answer and keeps every op codegen'd, where the interpreted-HOF
    // projection form would eval FhDim lambdas per TOKEN).
    checked("ml_feature_hash", {
      val sign = s"CASE WHEN (h // $FhDim) % 2 = 0 THEN 1 ELSE -1 END"
      s"""WITH th AS (SELECT doc_id, ${sqlH60All(sqlTokens("text"))} AS th
         |  FROM documents)
         |SELECT doc_id,
         |  array_to_string(list_transform(range(1, ${FhDim + 1}), i ->
         |    CAST(COALESCE(list_aggregate(list_transform(th, h ->
         |      CASE WHEN h % $FhDim = i - 1 THEN $sign ELSE 0 END), 'sum'), 0)
         |      AS BIGINT)), ',') AS fvec,
         |  CAST(list_aggregate(list_transform(range(1, ${FhDim + 1}), i ->
         |    abs(COALESCE(list_aggregate(list_transform(th, h ->
         |      CASE WHEN h % $FhDim = i - 1 THEN $sign ELSE 0 END), 'sum'), 0))),
         |    'sum') AS BIGINT) AS l1
         |FROM th""".stripMargin
    }) { (s, d) =>
      // The hashing/aggregation plan is unchanged (map-side combine to
      // ≤ FhDim cells per doc); only the DECLARED vector representation
      // is a joined string, because raw ArrayType cells break the
      // driver's pandas comparator (round-8 `err`).
      // explode FIRST, hash per row (h60All's ArrayTransform lambda is
      // interpreted; this keeps the token stream whole-stage-codegen'd).
      // explode_outer of an empty token array yields a NULL token → NULL
      // h → NULL idx, which the when(isNotNull) collect below drops —
      // identical to the previous array-of-hashes form.
      val ex = Tables.documents(s, d)
        .select(col("doc_id"), explode_outer(tokens(col("text"))).as("t"))
        .withColumn("h", h60(col("t")))
        .select(col("doc_id"), pmod(col("h"), lit(FhDim.toLong)).as("idx"),
          when(shiftright(col("h"), 6) % 2 === 0, 1L).otherwise(-1L).as("sg"))
      val cell = ex.groupBy("doc_id", "idx")
        .agg(sum(col("sg")).as("f"))
      cell.groupBy("doc_id")
        .agg(map_from_entries(collect_list(
          when(col("idx").isNotNull, struct(col("idx"), col("f"))))).as("mp"))
        .select(col("doc_id"),
          array_join(transform(sequence(lit(0L), lit(FhDim - 1L)),
            i => coalesce(element_at(col("mp"), i), lit(0L)).cast("string")),
            ",").as("fvec"),
          aggregate(transform(sequence(lit(0L), lit(FhDim - 1L)),
            i => abs(coalesce(element_at(col("mp"), i), lit(0L)))),
            lit(0L), (a, x) => a + x).as("l1"))
    },

    // DSIR — Data Selection via Importance Resampling (Xie et al.,
    // NeurIPS 2023): rank raw documents by how much they look like a
    // TARGET distribution, using hashed n-gram bag features — the
    // published recipe for selecting pretraining data toward a quality
    // domain without training a classifier. Target here = the corpus's
    // 'en' slice; features = unigram h60 hashes bucketed mod DsirB.
    // Per-bucket importance log-ratio ln(p̂_t(b)/p̂_r(b)) (Laplace +1,
    // one fixed IEEE tree over exact BIGINT counts) is quantized to the
    // LmLogScale grid — so each document's log-weight is an EXACT
    // integer sum of per-token table lookups, order- and engine-
    // independent (the text_lm_score argument). Declared surface: the
    // top-DsirTopK docs by weight (ties by doc_id). Scale shape: two
    // map-side-combined bucket-count aggregates (≤ DsirB cells each),
    // two bounded scalar totals, one broadcast of the DsirB-row ratio
    // table, one per-doc aggregate, TakeOrdered top-k — every stage
    // linear in corpus tokens, nothing depends on |corpus| beyond the
    // scans. The deliberately tiny bucket space (vs a real 10^4–10^5)
    // keeps collisions live at harness SFs so the hashing regime is
    // actually exercised.
    checked("corpus_dsir", {
      def ilog(x: String) = sqlIlog(x)
      s"""WITH t0 AS (SELECT doc_id, lang, ${sqlTokens("text")} AS tk
         |  FROM documents),
         |e AS (SELECT doc_id, lang, ${sqlH60("t")} % $DsirB AS b
         |  FROM (SELECT doc_id, lang, unnest(tk) AS t FROM t0) u),
         |cr AS (SELECT b, CAST(count(*) AS BIGINT) AS cr FROM e GROUP BY b),
         |ct AS (SELECT b, CAST(count(*) AS BIGINT) AS ct FROM e
         |  WHERE lang = '$DsirTarget' GROUP BY b),
         |tot AS (SELECT (SELECT count(*) FROM e) AS nr,
         |  (SELECT count(*) FROM e WHERE lang = '$DsirTarget') AS nt),
         |lr AS (SELECT cr.b,
         |    ${ilog(s"CAST((COALESCE(ct, 0) + 1) * (nr + $DsirB) AS DOUBLE) / " +
                     s"CAST((cr + 1) * (nt + $DsirB) AS DOUBLE)")} AS lrq
         |  FROM cr LEFT JOIN ct ON cr.b = ct.b, tot),
         |w AS (SELECT e.doc_id, e.lang, CAST(count(*) AS BIGINT) AS n_toks,
         |    CAST(sum(lrq) AS BIGINT) AS lw_q
         |  FROM e JOIN lr ON e.b = lr.b GROUP BY 1, 2)
         |SELECT doc_id, lang, n_toks, lw_q, rank FROM (
         |  SELECT *, CAST(row_number() OVER (ORDER BY lw_q DESC, doc_id)
         |    AS BIGINT) AS rank FROM w) r
         |WHERE rank <= $DsirTopK""".stripMargin
    }) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      // explode FIRST, hash per row: h60All is an interpreted HOF
      // (ArrayTransform lambda), while split/explode/md5/conv are all
      // codegen'd — same values, whole-stage-codegen'd token stream.
      val e = staged(Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          explode(tokens(col("text"))).as("t"))
        .select(col("doc_id"), col("lang"),
          (h60(col("t")) % DsirB).as("b"))) // h60 ≥ 0, % stays non-negative
      val cr = e.groupBy("b").agg(count(lit(1)).as("cr"))
      val ct = e.filter(col("lang") === DsirTarget)
        .groupBy(col("b").as("bt")).agg(count(lit(1)).as("ct"))
      // Two bounded 1-row totals (the corpus_clean literal-threshold
      // contract): inlined literals keep the ratio projection foldable.
      val totRow = e.agg(count(lit(1)).as("nr"),
        count(when(col("lang") === DsirTarget, 1)).as("nt")).head()
      val (nr, nt) = (totRow.getLong(0), totRow.getLong(1))
      val lr = cr.join(ct, col("b") === col("bt"), "left")
        .select(col("b"),
          ilogCol(((coalesce(col("ct"), lit(0L)) + 1L) * (nr + DsirB))
            .cast("double") /
            ((col("cr") + 1L) * (nt + DsirB)).cast("double")).as("lrq"))
      val w = e.join(broadcast(lr), "b")
        .groupBy("doc_id", "lang")
        .agg(count(lit(1)).as("n_toks"), sum(col("lrq")).as("lw_q"))
      // STRUCTURAL top-k (round-9 verdict #4): orderBy().limit() compiles
      // to TakeOrderedAndProject by construction — previously the bound
      // came from the optimizer rewriting a global row_number window
      // (InferWindowGroupLimit), i.e. one config/threshold away from a
      // single-partition global sort. The rank window now runs over the
      // ≤ DsirTopK-row bounded result only.
      w.orderBy(col("lw_q").desc, col("doc_id"))
        .limit(DsirTopK)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("lw_q").desc, col("doc_id"))).cast("long"))
        .select(col("doc_id"), col("lang"), col("n_toks"), col("lw_q"),
          col("rank"))
    },

    // Multinomial Naive Bayes quality classifier — the train-AND-apply
    // loop of the published corpus-filter pipelines (CCNet's fastText
    // filter, the GPT-3 quality classifier): a cheap model is trained
    // to IMITATE a quality oracle, then run over the whole corpus. The
    // oracle here is a stopword-density rule (density above the exact
    // corpus median ⇔ high-quality); the model is hashed-unigram
    // multinomial NB with Laplace smoothing. Determinism: density on
    // the integer NbSrScale grid, the median as the exact rank-
    // ((n+1) DIV 2) order statistic, per-bucket log-likelihoods
    // quantized to the LmLogScale grid (the text_lm_score argument) so
    // every doc score is an exact integer sum; argmax ties → 'hi',
    // mirrored. Declared surface: the 2×2 confusion matrix with
    // per-cell integer margin sums — hash-pinned eval. Scale shape:
    // labeling is one projection + a bounded ≤ NbSrScale-cell density
    // histogram (the exact-median path that replaces a global sort);
    // the model is a bounded artifact (NbB smoothed cells + 2 priors)
    // built by one map-side-combined aggregate over the train half and
    // BROADCAST to score the corpus — one token pass, one per-doc
    // aggregate, one 4-row confusion aggregate, linear end to end.
    checked("text_nb_classifier", {
      def ilog(x: String) = sqlIlog(x)
      val stopArr = NbStop.map(t => s"'$t'").mkString("[", ", ", "]")
      s"""WITH t0 AS (SELECT doc_id, ${sqlTokens("text")} AS tk
         |  FROM documents),
         |q AS (SELECT doc_id, tk,
         |    CASE WHEN len(tk) = 0 THEN 0
         |      ELSE len(list_filter(tk, t -> list_contains($stopArr, t)))
         |        * $NbSrScale // len(tk) END AS srq
         |  FROM t0),
         |med AS (SELECT srq AS m FROM (
         |  SELECT srq, row_number() OVER (ORDER BY srq, doc_id) AS rn,
         |    count(*) OVER () AS n FROM q) r
         |  WHERE rn = (n + 1) // 2),
         |lab AS (SELECT doc_id, tk, srq > (SELECT m FROM med) AS pos FROM q),
         |e AS (SELECT doc_id, pos, ${sqlH60("t")} % $NbB AS b
         |  FROM (SELECT doc_id, pos, unnest(tk) AS t FROM lab) u),
         |cnt AS (SELECT b,
         |    CAST(count(*) FILTER (WHERE pos) AS BIGINT) AS cp,
         |    CAST(count(*) FILTER (WHERE NOT pos) AS BIGINT) AS cn
         |  FROM e WHERE doc_id % 2 = 0 GROUP BY b),
         |tot AS (SELECT
         |  (SELECT COALESCE(sum(cp), 0) FROM cnt) AS np,
         |  (SELECT COALESCE(sum(cn), 0) FROM cnt) AS nn,
         |  (SELECT count(*) FROM lab WHERE doc_id % 2 = 0 AND pos) AS dp,
         |  (SELECT count(*) FROM lab WHERE doc_id % 2 = 0 AND NOT pos)
         |    AS dn),
         |spine AS (SELECT unnest(range(0, $NbB)) AS b),
         |model AS (SELECT spine.b,
         |    ${ilog(s"CAST(COALESCE(cp, 0) + 1 AS DOUBLE) / CAST(np + $NbB AS DOUBLE)")} AS lcp,
         |    ${ilog(s"CAST(COALESCE(cn, 0) + 1 AS DOUBLE) / CAST(nn + $NbB AS DOUBLE)")} AS lcn
         |  FROM spine LEFT JOIN cnt ON spine.b = cnt.b, tot),
         |prior AS (SELECT
         |    ${ilog(s"CAST(dp + 1 AS DOUBLE) / CAST(dp + dn + 2 AS DOUBLE)")} AS pp,
         |    ${ilog(s"CAST(dn + 1 AS DOUBLE) / CAST(dp + dn + 2 AS DOUBLE)")} AS pn
         |  FROM tot),
         |dsc AS (SELECT doc_id, CAST(sum(lcp) AS BIGINT) AS sp,
         |    CAST(sum(lcn) AS BIGINT) AS sn
         |  FROM e JOIN model ON e.b = model.b
         |  WHERE doc_id % 2 = 1 GROUP BY doc_id),
         |test AS (SELECT lab.doc_id, pos,
         |    pp + COALESCE(sp, 0) AS s_pos, pn + COALESCE(sn, 0) AS s_neg
         |  FROM lab LEFT JOIN dsc ON lab.doc_id = dsc.doc_id, prior
         |  WHERE lab.doc_id % 2 = 1)
         |SELECT CASE WHEN pos THEN 'hi' ELSE 'lo' END AS label,
         |  CASE WHEN s_pos >= s_neg THEN 'hi' ELSE 'lo' END AS pred,
         |  CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(s_pos - s_neg) AS BIGINT) AS margin_sum
         |FROM test GROUP BY 1, 2""".stripMargin
    }) { (s, d) =>
      def iloge(x: org.apache.spark.sql.Column) = ilogCol(x)
      val q = staged(Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("tk"))
        .withColumn("srq", when(size(col("tk")) === 0, 0L).otherwise(
          expr(s"size(filter(tk, t -> array_contains(" +
            s"array(${NbStop.map(t => s"'$t'").mkString(", ")}), t))) " +
            s"* ${NbSrScale}L DIV size(tk)"))))
      // Exact median via the bounded density histogram (≤ NbSrScale
      // cells by construction) — the scale path that replaces a global
      // sort; the rank-k cell is found on the driver.
      val hist = q.groupBy("srq").agg(count(lit(1)).as("c"))
        .orderBy("srq").collect()
      val n = hist.map(_.getLong(1)).sum
      val kRank = (n + 1) / 2
      var acc = 0L
      var med = 0L
      val it = hist.iterator
      while (acc < kRank && it.hasNext) {
        val r = it.next(); acc += r.getLong(1); med = r.getLong(0)
      }
      val lab = staged(q.select(col("doc_id"), col("tk"),
        (col("srq") > med).as("pos")))
      val e = staged(lab
        .select(col("doc_id"), col("pos"), explode(col("tk")).as("t"))
        .select(col("doc_id"), col("pos"), (h60(col("t")) % NbB).as("b")))
      val cnt = e.filter(col("doc_id") % 2 === 0)
        .groupBy("b")
        .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("cp"),
          sum(when(!col("pos"), 1L).otherwise(0L)).as("cn"))
      // Bounded scalar model totals (token + doc priors) — the corpus_
      // clean literal contract; the model itself stays a DataFrame.
      val tRow = cnt.agg(coalesce(sum(col("cp")), lit(0L)),
        coalesce(sum(col("cn")), lit(0L))).head()
      val (np, nn) = (tRow.getLong(0), tRow.getLong(1))
      val dRow = lab.filter(col("doc_id") % 2 === 0)
        .agg(count(when(col("pos"), 1)), count(when(!col("pos"), 1))).head()
      val (dp, dn) = (dRow.getLong(0), dRow.getLong(1))
      val spine = s.range(0, NbB).select(col("id").as("sb"))
      val model = spine.join(cnt, col("sb") === col("b"), "left")
        .select(col("sb").as("b"),
          iloge((coalesce(col("cp"), lit(0L)) + 1L).cast("double") /
            lit(np + NbB).cast("double")).as("lcp"),
          iloge((coalesce(col("cn"), lit(0L)) + 1L).cast("double") /
            lit(nn + NbB).cast("double")).as("lcn"))
      val pp = math.floor(math.log((dp + 1).toDouble / (dp + dn + 2)) *
        LmLogScale + 0.5).toLong
      val pn = math.floor(math.log((dn + 1).toDouble / (dp + dn + 2)) *
        LmLogScale + 0.5).toLong
      val dsc = e.filter(col("doc_id") % 2 === 1)
        .join(broadcast(model), "b")
        .groupBy("doc_id")
        .agg(sum(col("lcp")).as("sp"), sum(col("lcn")).as("sn"))
      val test = lab.filter(col("doc_id") % 2 === 1)
        .join(dsc, Seq("doc_id"), "left")
        .select(col("pos"),
          (lit(pp) + coalesce(col("sp"), lit(0L))).as("s_pos"),
          (lit(pn) + coalesce(col("sn"), lit(0L))).as("s_neg"))
      test.groupBy(
          when(col("pos"), "hi").otherwise("lo").as("label"),
          when(col("s_pos") >= col("s_neg"), "hi").otherwise("lo").as("pred"))
        .agg(count(lit(1)).as("n"),
          sum(col("s_pos") - col("s_neg")).as("margin_sum"))
    })
  /** The computed-route candidate frame: the assigned corpus chain with
    * each chunk row fanned out to the queries probing its list — the
    * probe "join" expressed as an explode of a LITERAL c_id →
    * [(query_id, qv, qn2)] map lookup (r21). Semantically identical to
    * `probes ⋈ asg ON c_id` (the map holds exactly the probe pairs),
    * but the physical plan needs neither a join — whose pushed
    * isnotnull(c_id) would re-evaluate the 8-way DotLong argmin per row
    * (guide §4.4) — nor a checkpoint of the assigned frame: one lazy
    * corpus pass, argmin evaluated once per row inside the generator.
    * Output: (doc_id, i, leng, vv, n2, query_id, qv, qn2). */
  private def ragCandidatesComputed(s: org.apache.spark.sql.SparkSession,
                                    d: String): org.apache.spark.sql.DataFrame = {
    val cent = cciCentroids(s, d)
    val probes = probeMemo.get(centProbeKey(s, cent))
    val entries = probes.groupBy(_._4).toSeq.sortBy(_._1).flatMap {
      case (cid, ps) =>
        Seq(lit(cid), array(ps.sortBy(_._1).map { case (qid, qv, qn2, _) =>
          struct(lit(qid).as("query_id"),
            array(qv.map(lit): _*).as("qv"), lit(qn2).as("qn2"))
        }: _*))
    }
    val probeMap = map(entries: _*)
    cciAssign(cciVecsLazy(s, d), cent)
      .select(col("doc_id"), col("i"), col("leng"), col("vv"), col("n2"),
        explode(element_at(probeMap, col("c_id"))).as("p"))
      .select(col("doc_id"), col("i"), col("leng"), col("vv"), col("n2"),
        col("p.query_id").as("query_id"), col("p.qv").as("qv"),
        col("p.qn2").as("qn2"))
  }

  /** Memo key + fill helper: [[ragCandidatesComputed]] needs the probe
    * ROWS, not the broadcast frame — route through the same memo. */
  private def centProbeKey(s: org.apache.spark.sql.SparkSession,
                           cent: Seq[(Long, Seq[Long], Double)])
      : Seq[(Long, Seq[Long], Double)] = {
    ragQueryProbes(s, cent) // ensures the memo entry exists
    cent
  }

  /** Deterministic structural probe for the scale rehearsal (r21,
    * verdict #1): the number of candidate rows entering
    * rag_chunk_retrieve's probe fan-out on corpus `d` — Σ over chunks of
    * the probes hitting their list. A quadratic-in-corpus probe shape
    * fails a ratio gate on this count regardless of host load, where the
    * wall gate was denominator-fragile. */
  private[graft] def ragCandidateCount(s: org.apache.spark.sql.SparkSession,
                                       d: String): Long =
    ragCandidatesComputed(s, d).count()

  /** Structural bound gates for the fusion family's full-outer candidate
    * join (r22, VERDICT r21 #1): the row counts of the four retained
    * top-k frames that feed [[rrfFused]]/[[fwFused]] — raw lex/vec and
    * their planted twins. Every one is ≤ |queries|·topK by the
    * row_number filter; PlanShapeSpec pins the measured counts against
    * that bound, so the full-outer SortMergeJoin the plans now carry is
    * PROVABLY rank-bounded on both sides (never corpus-scale), not just
    * argued so. Keys match [[Bm25Queries]]/[[PlantedQueries]]. */
  private[graft] def fusionSideCounts(s: org.apache.spark.sql.SparkSession,
                                      d: String): Map[String, Long] =
    try Map(
      "lex" -> bm25LexRankFrom(bm25AggSpark(s, d)).count(),
      "vec" -> rrfVecRankFrom(rrfVecScored(s, d)).count(),
      "plex" -> bm25LexRankFrom(
        bm25AggOver(s, plantedDocs(s, d), PlantedQueries)).count(),
      "pvec" -> rrfVecRankFrom(
        vecScoredOver(plantedVecs(s, d), PlantedQueries.length)).count())
    finally QuerySpec.releaseStaged()

  /** The bound [[fusionSideCounts]] is gated against: raw sides admit
    * |Bm25Queries|·topK rows, planted sides |PlantedQueries|·topK. */
  private[graft] def fusionSideBound(key: String): Long =
    (if (key.startsWith("p")) PlantedQueries.length else Bm25Queries.length)
      .toLong * Bm25TopK

}
