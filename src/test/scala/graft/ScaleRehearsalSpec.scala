package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{DedupQueries, QuerySpec, SimilarityQueries, TmpDirs}

/** Scale-rehearsal gate (round-9 verdict #2): sf0.1 cannot expose
  * quadratic-in-block shapes — round 9's `er_fuzzy_match` passed every
  * correctness gate while carrying a pair count that grows O(n²/25) —
  * so this spec synthesizes a 10× blow-up of the pair-generating tables
  * and asserts the heavy declared queries stay NEAR-LINEAR between the
  * base and blown corpora.
  *
  * Blow-up construction (once per JVM, the write-once layout pattern):
  * 10 key-shifted copies of supplier / documents / embeddings, each copy
  * DECORRELATED from the others so the blown corpus is "10× more data",
  * not "10 duplicates of the same data" (identical copies would make
  * every near-dup relation legitimately quadratic and the linearity
  * assertion meaningless):
  *
  *  - supplier: fresh suppkeys, names regenerated from the new key (the
  *    generator's own `Supplier#<9 digits>` shape), nationkey KEPT — the
  *    block key stays constant-cardinality 25, which is exactly the
  *    regime that kills all-pairs blocking;
  *  - documents: fresh doc_ids; copy i's text passes through a rotated-
  *    alphabet `translate`, so every shingle/fingerprint differs across
  *    copies (cross-copy Jaccard 0) while each copy's internal dup
  *    structure is preserved — total near-dup pairs scale ×10;
  *  - embeddings: fresh vec_ids; copy i's vector is dimension-ROTATED
  *    (by 7·i mod 64), which scrambles every SRP/IVF projection across
  *    copies — same norm, unrelated buckets — so index fan-out scales
  *    ×10, not ×100.
  *
  * Two gates:
  *
  *  1. PAIR-COUNT growth (deterministic, the real quadratic detector):
  *     the fixed er_fuzzy_match's total pairs must grow ≈×10 (its SNM
  *     bound is n·W), while a deliberately un-capped all-pairs-within-
  *     nationkey variant — the exact shape round 9 shipped — must
  *     EXCEED the linearity threshold, proving this gate catches it.
  *  2. WALL growth (loose regression tripwire): each heavy declared
  *     query must complete the blown corpus within `WallRatioMax`× its
  *     warm base wall (linear would be ≈10×; the slack absorbs fixed
  *     job overhead and JIT noise on the 4-thread test session).
  */
class ScaleRehearsalSpec extends SparkSpec {

  private val Base = "/root/testdata/sf0.01"
  private val Copies = 10
  /** Near-linearity ceiling for a ×10 data blow-up. A linear query lands
    * well under it (≤ ~12× pairs, ≤ ~10× wall + overhead); a
    * quadratic-in-block shape lands at ~×100 pairs. */
  private val PairRatioMax = 25.0
  /** Wall-clock gates are load- and machine-sensitive (a contended CI
    * host can blow the absolute cap without any plan regression), so
    * the deterministic pair-count gate above is the HARD quadratic
    * detector and the wall gates scale by GRAFT_SCALE_WALL_MULT
    * (default 1.0; set >1 on slow hosts, 0 to make walls warn-only). */
  private val WallMult = sys.env.get("GRAFT_SCALE_WALL_MULT") match {
    case None => 1.0
    case Some(raw) =>
      scala.util.Try(raw.toDouble).getOrElse {
        // a typo'd knob must not crash the spec, but it also must not
        // silently disable a gate — fall back to the strict default
        System.err.println(
          s"[ScaleRehearsalSpec] GRAFT_SCALE_WALL_MULT='$raw' is not a " +
            "number; ignoring it and keeping the default wall gates (1.0)")
        1.0
      }
  }
  private val WallRatioMax = 25.0 * (if (WallMult > 0) WallMult else 1.0)
  private val WallAbsMax = 60.0 * (if (WallMult > 0) WallMult else 1.0)
  private val WallsHard = WallMult > 0
  if (!WallsHard)
    System.err.println(
      "[ScaleRehearsalSpec] GRAFT_SCALE_WALL_MULT=0 — WALL GATES ARE " +
        "WARN-ONLY this run; the pair-count gate remains hard")

  private lazy val blownDir: String = ScaleRehearsalSpec.blownDir(spark, Base)

  private def run(name: String, d: String): Array[org.apache.spark.sql.Row] =
    try {
      SparkEntry.allQueries.find(_.name == name)
        .getOrElse(fail(s"no query named $name")).fn(spark, d).collect()
    } finally QuerySpec.releaseStaged()

  test("blow-up layout: 10x rows, decorrelated copies") {
    val s = spark
    def n(d: String, t: String) = s.read.parquet(s"$d/$t.parquet").count()
    for (t <- Seq("supplier", "documents", "embeddings"))
      assert(n(blownDir, t) == Copies * n(Base, t), s"$t not blown 10x")
    // decorrelation: blown documents have ~10x distinct texts (rotation
    // really changed them), and supplier names stay globally unique
    val docs = s.read.parquet(s"$blownDir/documents.parquet")
    assert(docs.select("text").distinct().count() >
      4L * s.read.parquet(s"$Base/documents.parquet")
        .select("text").distinct().count())
    val sup = s.read.parquet(s"$blownDir/supplier.parquet")
    assert(sup.select("s_name").distinct().count() == sup.count())
  }

  test("er_fuzzy_match pair growth is linear; the un-capped variant is caught") {
    def totalPairs(rows: Array[org.apache.spark.sql.Row]): Long =
      rows.map(_.getLong(2)).sum // n_pairs column
    // Linearity means PAIRS PER ROW bounded by the constant W at every
    // scale (raw pair-total ratios mislead when base blocks are smaller
    // than W: 4-member blocks emit ~2 pairs/row, 40-member blocks
    // saturate at ~W — a 3.5x per-row rise that is still O(n·W)).
    val baseN = spark.read.parquet(s"$Base/supplier.parquet").count()
    val blownN = spark.read.parquet(s"$blownDir/supplier.parquet").count()
    val basePairs = totalPairs(run("er_fuzzy_match", Base))
    val blownPairs = totalPairs(run("er_fuzzy_match", blownDir))
    assert(basePairs <= baseN * DedupQueries.ErWindow &&
      blownPairs <= blownN * DedupQueries.ErWindow,
      s"SNM bound broken: $basePairs/$baseN, $blownPairs/$blownN pairs/rows " +
        s"vs W=${DedupQueries.ErWindow}")

    // The PLANTED regression: all pairs within the bare nationkey block —
    // the exact shape round 9 shipped. Its pair count must blow past the
    // linearity ceiling here (≈×100: block count is constant, membership
    // ×10), proving this gate would have caught it.
    def uncappedPairs(d: String): Long = {
      val sup = spark.read.parquet(s"$d/supplier.parquet")
        .select(col("s_suppkey").as("k"), col("s_nationkey").as("b"))
      val right = sup.select(col("k").as("k2"), col("b").as("b2"))
      sup.join(right, col("b") === col("b2") && col("k") < col("k2")).count()
    }
    // pairs PER ROW must grow ~10x for the quadratic shape (constant
    // block count, 10x membership) while the fixed query's stays ≤ W
    val uncappedPerRowRatio =
      (uncappedPairs(blownDir).toDouble / blownN) / (uncappedPairs(Base).toDouble / baseN)
    assert(uncappedPerRowRatio > 5.0,
      s"planted un-capped variant's pairs/row grew only ${uncappedPerRowRatio}x " +
        "— the gate no longer discriminates quadratic block fan-out")
    val uncappedRatio = uncappedPairs(blownDir).toDouble / uncappedPairs(Base)
    assert(uncappedRatio > PairRatioMax,
      s"planted un-capped variant grew only ${uncappedRatio}x — the gate " +
        "no longer discriminates quadratic block fan-out")
  }

  test("heavy declared queries stay near-linear on the 10x corpus") {
    val heavy = Seq("er_fuzzy_match", "dedup_stopshingle", "dedup_minhash",
      "dedup_simhash", "ann_srp_lsh", "ann_ivf",
      // round-10 pair-graph consumers: SNM weights, pairwise BLEU, LPA
      "er_match_weights", "text_bleu", "graph_label_propagation",
      // round-19 retrieval family: hybrid fusion (BM25 + cosine chains,
      // rank-bounded tails) and chunk-index retrieval (chunk fan-out +
      // probed-list candidate join) — copy 0 of the blow-up is the
      // identity copy, so the fixed-id query seeds and centroid docs
      // survive and the corpus-scaled upstream is what grows 10x
      "retrieval_rrf", "retrieval_fusion_weighted", "rag_chunk_retrieve",
      // round-20 (verdict #4): the dedup banding designs whose 100 TB
      // claims previously rested on sf0.1 alone — SemDeDup's
      // cluster-then-prune (fixed-id centroid seeds survive via the
      // identity copy; the rotated copies decorrelate the clusters) and
      // the ExactSubstr inverted index (position-tagged, zero pair
      // generation — the rotation gives each copy its own suffix space)
      "dedup_semantic", "dedup_exact_substr",
      // round-20 packing tail: both packers retrieve through the same
      // chunk chain rag_chunk_retrieve rehearses, then bound their tails
      // by construction — context_pack packs a rank-bounded window,
      // context_pack_mmr collects only queries·C rows (C = PackMmrCand)
      // to the driver for the greedy, a constant independent of corpus
      // size. The rehearsal proves the walls track the retrieval, not
      // the corpus.
      "rag_context_pack", "rag_context_pack_mmr")
    val report = heavy.map { q =>
      run(q, Base) // warm-up: JIT + codegen + per-sf layout builds
      // Warm the BLOWN corpus too (r21, verdict #1b): the r20 gate timed
      // the blown run cold, so one-time staged-layout builds and JIT
      // landed in the blown numerator while the base denominator was
      // warm — a denominator-fragile ratio that false-alarmed at 47.7x
      // with a byte-identical shuffle profile.
      run(q, blownDir)
      val b0 = System.nanoTime(); run(q, Base)
      val baseWall = (System.nanoTime() - b0) / 1e9
      val t0 = System.nanoTime()
      val rows = run(q, blownDir)
      val blownWall = (System.nanoTime() - t0) / 1e9
      assert(rows.nonEmpty, s"$q returned nothing on the blown corpus")
      (q, baseWall, blownWall, blownWall / baseWall)
    }
    info(report.map { case (q, b, bl, r) =>
      f"$q: base $b%.2fs -> blown $bl%.2fs (${r}%.1fx)" }.mkString("; "))
    report.foreach { case (q, _, blownWall, ratio) =>
      val msgs = Seq(
        (ratio <= WallRatioMax,
          s"$q wall grew ${ratio}x on a 10x corpus — super-linear shape"),
        (blownWall <= WallAbsMax, s"$q took ${blownWall}s on the 10x corpus"))
      msgs.foreach { case (ok, msg) =>
        if (WallsHard) assert(ok, msg) else if (!ok) info(s"WARN: $msg")
      }
    }
  }
  test("rag_chunk_retrieve candidate fan-out stays near-linear on the 10x corpus") {
    // Deterministic STRUCTURAL gate (r21, verdict #1a — the
    // media-phash-pattern counter applied to the chunk-retrieval chain):
    // candidate rows entering the probe fan-out, base vs blown. Chunks
    // grow ~10x and the probe set is constant (queries × CciProbe over a
    // fixed list count), so a linear chain lands near 10x; a
    // quadratic-in-corpus probe shape lands near 100x and fails here
    // regardless of host load — wall clock is no longer the only
    // evidence for this query.
    val baseCand = graft.queries.TextQueries.ragCandidateCount(spark, Base)
    val blownCand = graft.queries.TextQueries.ragCandidateCount(spark, blownDir)
    info(s"rag probe candidates: base $baseCand -> blown $blownCand " +
      f"(${blownCand.toDouble / baseCand}%.1fx)")
    assert(baseCand > 0, "no probe candidates on the base corpus")
    assert(blownCand.toDouble / baseCand <= PairRatioMax,
      s"probe candidate rows grew ${blownCand.toDouble / baseCand}x on a " +
        "10x corpus — super-linear probe fan-out")
  }

  test("media phash banding stays near-linear on a 10x media corpus") {
    // media_phash_dedup's corpus is synthesized at a fixed size (1 800),
    // not read from the sf dir, so its 10x rehearsal blows the CORPUS
    // PARAMETER and re-runs the same hash -> 4x16-bit-band -> bucket-join
    // chain the declared query uses (verdict #4: the banding design's
    // scale claim previously rested on the fixed size alone). Gates:
    //  1. candidate pairs per hashed row may rise with density (16-bit
    //     bands have birthday growth) but must stay FAR below the
    //     all-pairs regime — measured 0.37 -> 0.87 pairs/row at 10x
    //     (2.3x per-row); the gate allows 5x per-row, while a quadratic
    //     shape would show ~10x per-row growth with per-row counts in
    //     the hundreds;
    //  2. the planted near-dup recall stays structural (100 %) at 10x —
    //     banding must not lose planted pairs as buckets crowd.
    import graft.multimodal.MediaOps
    val s = spark
    import s.implicits._
    def chain(n: Int): (Long, Long, Long, Long) = {
      val feats = MediaOps.phashCorpus(s, n)
        .mapPartitions(rows => rows.map(r =>
          (r.media_id, MediaOps.aHash64(MediaOps.contentPlane(r.bytes)))))
        .toDF("media_id", "phash")
      val hashed = feats.filter(col("phash") =!= 0L).cache()
      val nh = hashed.count()
      val bands = hashed.select(col("media_id"), col("phash"),
        explode(array((0 until 4).map(j =>
          shiftrightunsigned(col("phash"), 16 * j).bitwiseAND(lit(65535L)) +
            lit(j * 65536L)): _*)).as("bk"))
      val cand = bands.as("x").join(bands.as("y"),
          col("x.bk") === col("y.bk") &&
            col("x.media_id") < col("y.media_id"))
        .select(col("x.media_id").as("ia"), col("y.media_id").as("ib"),
          col("x.phash").as("ha"), col("y.phash").as("hb"))
        .distinct().cache()
      val nc = cand.count()
      val ham = bit_count(col("ha").bitwiseXOR(col("hb")))
      val found = cand.filter(ham <= 8 && col("ia") % 3 === 0 &&
        col("ib") === col("ia") + 1).count()
      val planted = hashed.as("x").join(hashed.as("y"),
        col("y.media_id") === col("x.media_id") + 1 &&
          col("x.media_id") % 3 === 0).count()
      hashed.unpersist(); cand.unpersist()
      (nh, nc, found, planted)
    }
    val (bh, bc, bf, bp) = chain(1800)
    val (xh, xc, xf, xp) = chain(18000)
    assert(xh >= 9 * bh, s"blown corpus not ~10x: $bh -> $xh hashed")
    assert(bf == bp && xf == xp,
      s"planted recall broke: base $bf/$bp, blown $xf/$xp")
    val perRowRatio = (xc.toDouble / xh) / (bc.toDouble / bh)
    info(f"phash candidates/row: base ${bc.toDouble / bh}%.3f -> " +
      f"blown ${xc.toDouble / xh}%.3f (${perRowRatio}%.1fx per-row)")
    assert(perRowRatio < 5.0,
      s"phash band fan-out grew ${perRowRatio}x per row on 10x media — " +
        "the 16-bit bands are saturating toward all-pairs; widen the " +
        "bands or add a band-frequency cap (the dedup_minhash BandCap)")
  }
}

object ScaleRehearsalSpec {
  /** Build (once per JVM) the blown-up sf dir: 10 decorrelated copies of
    * supplier/documents/embeddings, the remaining tables passed through. */
  def blownDir(s: SparkSession, base: String): String = {
    val dir = TmpDirs.scoped(s"graft_scale10_${QuerySpec.jvmScopedKey(base)}")
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      dir.mkdirs()
      val lower = "abcdefghijklmnopqrstuvwxyz"
      val upper = lower.toUpperCase
      def rot(a: String, i: Int) = a.drop(i) + a.take(i)
      def copies(t: String)(f: (DataFrame, Int) => DataFrame): Unit = {
        val b = s.read.parquet(s"$base/$t.parquet")
        (0 until 10).map(i => f(b, i)).reduce(_ unionAll _)
          .write.mode("overwrite")
          .parquet(new java.io.File(dir, s"$t.parquet").getAbsolutePath)
      }
      copies("supplier") { (b, i) =>
        b.select(
          (col("s_suppkey") + i * 1000000L).as("s_suppkey"),
          concat(lit("Supplier#"),
            lpad((col("s_suppkey") + i * 1000000L).cast("string"), 9, "0"))
            .as("s_name"),
          col("s_nationkey"), col("s_acctbal"))
      }
      copies("documents") { (b, i) =>
        b.select(
          (col("doc_id") + i * 10000000L).as("doc_id"),
          translate(col("text"), lower + upper, rot(lower, i) + rot(upper, i))
            .as("text"),
          col("lang"), col("source"), col("n_chars"))
      }
      val dim = SimilarityQueries.Dim
      copies("embeddings") { (b, i) =>
        val shift = (7 * i) % dim
        b.select(
          (col("vec_id") + i * 10000000L).as("vec_id"),
          expr(s"transform(sequence(0, ${dim - 1}), " +
            s"j -> embedding[(j + $shift) % $dim])").as("embedding"),
          col("label"))
      }
      for (t <- Tables.names if !Set("supplier", "documents", "embeddings")(t))
        s.read.parquet(s"$base/$t.parquet").write.mode("overwrite")
          .parquet(new java.io.File(dir, s"$t.parquet").getAbsolutePath)
      new java.io.File(dir, "_SUCCESS").createNewFile()
    }
    dir.getAbsolutePath
  }
}
