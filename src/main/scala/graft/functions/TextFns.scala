package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline primitives (tokenize / hash / shingle / MinHash / SimHash /
  * fingerprint / language-ID) declared as paired Spark `Column` + DuckDB SQL
  * builders, like [[DetAgg]].
  *
  * Everything is built on ONE cross-engine numeric hash:
  * `h60(s) = int(md5(s)[0:15 hex])` — md5 bytes are identical in Spark and
  * DuckDB, 15 hex digits = 60 bits fits a signed 64-bit int — and on exact
  * integer arithmetic (scaled-int dot products, modular minhash permutations),
  * so results are bit-identical regardless of partitioning or engine. No
  * UDFs anywhere: all expressions are Catalyst higher-order functions
  * (`transform`/`aggregate`/`zip_with`) that stay inside codegen and scale
  * as plain projections — a 100 TB corpus maps these per-row with no
  * shuffle until the explicit groupBy/join stages of the dedup queries.
  *
  * Reference basis: the reference has no text ops; these are the north-star
  * LLM-pipeline additions (builder prompt; SURVEY §7 step 6).
  */
object TextFns {
  /** MinHash modulus (largest signed-32 prime). */
  val P: Long = 2147483647L

  // ---------------------------------------------------------------------
  // Tokenization
  // ---------------------------------------------------------------------

  /** Whitespace tokens of lower-cased text; empty text → empty array.
    * (Spark `split` and DuckDB `regexp_split_to_array` both yield [""] on
    * empty input, hence the explicit guard on both sides.) */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(lower(text)), "\\s+"))

  def sqlTokens(text: String): String =
    s"CASE WHEN length(trim($text)) = 0 THEN [] " +
      s"ELSE regexp_split_to_array(trim(lower($text)), '\\s+') END"

  /** Spark-SQL spelling of [[tokens]] (the parser-route twin; regex
    * backslash doubled for the SQL parser's escape pass). */
  def sparkSqlTokens(text: String): String =
    s"CASE WHEN length(trim($text)) = 0 THEN CAST(array() AS ARRAY<STRING>) " +
      s"ELSE split(trim(lower($text)), '\\\\s+') END"

  /** BPE-ish sub-token split: runs of letters, runs of digits, single other
    * non-space chars. Same regex dialect subset in Java and RE2. */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  def sqlBpeTokens(text: String): String =
    s"regexp_extract_all(lower($text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')"

  // ---------------------------------------------------------------------
  // The cross-engine 60-bit hash
  // ---------------------------------------------------------------------

  /** First 60 bits of md5 as a non-negative BIGINT — identical in both
    * engines by construction. */
  def h60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  def sqlH60(s: String): String =
    s"CAST('0x' || substr(md5($s), 1, 15) AS BIGINT)"

  /** Spark-SQL spelling of [[h60]] (`conv` base-16→10; same 60-bit
    * non-negative value as the DuckDB '0x' cast). */
  def sparkSqlH60(s: String): String =
    s"CAST(conv(substr(md5($s), 1, 15), 16, 10) AS BIGINT)"

  /** Element-wise h60 over a string array. */
  def h60All(arr: Column): Column = transform(arr, t => h60(t))

  def sqlH60All(arr: String): String =
    s"list_transform($arr, t -> ${sqlH60("t")})"

  // ---------------------------------------------------------------------
  // Shingles
  // ---------------------------------------------------------------------

  /** Word n-gram shingles (space-joined) of a token array; fewer than n
    * tokens → empty. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

  def sqlShingles(toks: String, n: Int): String =
    s"CASE WHEN len($toks) < $n THEN [] " +
      s"ELSE list_transform(range(1, len($toks) - ${n - 2}), " +
      s"i -> array_to_string(($toks)[i:i+${n - 1}], ' ')) END"

  // ---------------------------------------------------------------------
  // MinHash (k permutations (a*h+b) mod P over shingle h60s)
  // ---------------------------------------------------------------------

  /** Deterministic permutation constants, shared by both engines.
    * a ∈ [1, 2^20) keeps a*(h mod P) < 2^51 — no 64-bit overflow. */
  def perms(k: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(k)((rnd.nextInt((1 << 20) - 1).toLong + 1, rnd.nextInt(1 << 30).toLong))
  }

  /** MinHash signature (array of k minima); empty shingle set → all-P. */
  def minhashSig(shingleHashes: Column, k: Int): Column = {
    val sig = perms(k).map { case (a, b) =>
      coalesce(
        array_min(transform(shingleHashes, h => (h % P * a + b) % P)),
        lit(P))
    }
    array(sig: _*)
  }

  def sqlMinhashSig(shingleHashes: String, k: Int): String = {
    val sig = perms(k).map { case (a, b) =>
      s"COALESCE(list_min(list_transform($shingleHashes, h -> (h % ${P} * ${a} + ${b}) % ${P})), ${P})"
    }
    sig.mkString("[", ", ", "]")
  }

  /** LSH band keys: split the k-wide signature into bands of r, join each
    * band's values into one string key. Output: array of "bandIdx:key". */
  def lshBands(sig: Column, k: Int, r: Int): Column = {
    val bands = (0 until k / r).map { bi =>
      concat_ws(":", lit(bi.toString) +:
        (1 to r).map(j => element_at(sig, bi * r + j).cast("string")): _*)
    }
    array(bands: _*)
  }

  def sqlLshBands(sig: String, k: Int, r: Int): String = {
    val bands = (0 until k / r).map { bi =>
      val parts = (1 to r).map(j => s"CAST(($sig)[${bi * r + j}] AS VARCHAR)")
      s"concat_ws(':', '$bi', ${parts.mkString(", ")})"
    }
    bands.mkString("[", ", ", "]")
  }

  /** Exact Jaccard over two pre-distinct hash sets (carried as arrays). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = (size(a) + size(b)).cast("double") - inter
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  def sqlJaccard(a: String, b: String): String = {
    val inter = s"CAST(len(list_intersect($a, $b)) AS DOUBLE)"
    val uni = s"(CAST(len($a) + len($b) AS DOUBLE) - $inter)"
    s"CASE WHEN $uni = 0 THEN 0.0 ELSE $inter / $uni END"
  }

  // ---------------------------------------------------------------------
  // SimHash (60-bit over token h60s)
  // ---------------------------------------------------------------------

  /** 60-bit SimHash: bit j set iff Σ_tokens (±1 by token-hash bit j) > 0.
    * Via `expr`: the Scala DSL's shift functions only accept literal shift
    * amounts, while the SQL `>>`/`shiftleft` forms take any expression —
    * needed because the shift is the outer lambda variable. */
  def simhash(tokHashesCol: String): Column = expr(
    s"""aggregate(sequence(0, 59), CAST(0 AS BIGINT), (acc, j) -> acc +
       | (CASE WHEN aggregate($tokHashesCol, CAST(0 AS BIGINT),
       |   (s, h) -> s + (CASE WHEN (h >> j) & 1 = 1 THEN CAST(1 AS BIGINT)
       |                  ELSE CAST(-1 AS BIGINT) END)) > 0
       |  THEN shiftleft(CAST(1 AS BIGINT), j) ELSE CAST(0 AS BIGINT) END))"""
      .stripMargin.replace("\n", " "))

  def sqlSimhash(tokHashes: String): String =
    // Outer CAST: list_aggregate 'sum' yields HUGEINT in DuckDB.
    s"""CAST(list_aggregate(list_transform(range(0, 60), j -> CASE WHEN
       | list_aggregate(list_transform($tokHashes,
       |   h -> CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END), 'sum') > 0
       | THEN (CAST(1 AS BIGINT) << j) ELSE 0 END), 'sum') AS BIGINT)""".stripMargin.replace("\n", " ")

  /** 15-bit SimHash bands (4 per signature): pigeonhole guarantees any pair
    * at Hamming distance ≤ 3 collides on ≥ 1 band. */
  def simhashBand(sim: Column, band: Int): Column =
    shiftright(sim, band * 15).bitwiseAND((1 << 15) - 1)

  def sqlSimhashBand(sim: String, band: Int): String =
    s"(($sim) >> ${band * 15}) & ${(1 << 15) - 1}"

  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  def sqlHamming(a: String, b: String): String = s"bit_count(xor($a, $b))"

  // ---------------------------------------------------------------------
  // Rolling-hash fingerprint (first 64 tokens, base-31 polynomial mod P)
  // ---------------------------------------------------------------------

  val FpLen = 64

  /** 31^i mod P for i in [0, FpLen) — shared literal table. */
  lazy val pow31: IndexedSeq[Long] =
    Iterator.iterate(1L)(p => p * 31 % P).take(FpLen).toIndexedSeq

  /** Polynomial rolling hash of the first [[FpLen]] token hashes:
    * Σ (h_i mod P) · 31^(m-1-i) mod P. Expressed as a position-indexed sum
    * (not a fold — DuckDB 1.0 has no list_reduce); each term < 2^51 and the
    * ≤ 64-term sum < 2^57, so integer math never overflows. */
  def fingerprint(tokHashes: Column): Column = {
    val hs = slice(tokHashes, 1, FpLen)
    val powLit = array(pow31.map(lit): _*)
    val m = size(hs)
    when(m === 0, lit(0L)).otherwise(
      aggregate(
        transform(sequence(lit(1), m),
          i => (element_at(hs, i) % P) * element_at(powLit, m - i + 1) % P),
        lit(0L), (acc, x) => acc + x) % P)
  }

  def sqlFingerprint(tokHashes: String): String = {
    val powLit = pow31.mkString("[", ", ", "]")
    val hs = s"(($tokHashes)[1:$FpLen])"
    // Outer CAST: DuckDB list_aggregate(...,'sum') yields HUGEINT (fetched
    // as float64); Spark emits BIGINT — cast so the strict hash gate agrees.
    s"""CAST(CASE WHEN len($hs) = 0 THEN 0 ELSE
       | list_aggregate(list_transform(range(1, len($hs) + 1),
       |  i -> ($hs[i] % ${P}) * (${powLit})[len($hs) - i + 1] % ${P}),
       | 'sum') % ${P} END AS BIGINT)""".stripMargin.replace("\n", " ")
  }

  // ---------------------------------------------------------------------
  // BPE merge application
  // ---------------------------------------------------------------------

  /** Apply an ordered merge table to a token sequence — the tokenizer's
    * ENCODE loop (the training half is text_bpe_pairs' pair count).
    * Declared semantics, deterministic by construction: repeatedly take
    * the highest-priority merge that occurs anywhere in the sequence,
    * merge ALL its non-overlapping occurrences left-to-right, and restart
    * from the top of the table (a merge can create new occurrences of
    * higher-priority pairs); stop at the fixpoint. The fixpoint is the
    * checkable contract: NO adjacent pair of the output may appear in the
    * merge table. Terminates because every merge strictly shortens the
    * sequence. */
  def bpeApply(toks: IndexedSeq[String],
               merges: Seq[(String, String)]): IndexedSeq[String] = {
    var cur = toks
    var changed = true
    while (changed) {
      changed = false
      val it = merges.iterator
      while (!changed && it.hasNext) {
        val (a, b) = it.next()
        var i = 0
        val out = IndexedSeq.newBuilder[String]
        var hit = false
        while (i < cur.length) {
          if (i + 1 < cur.length && cur(i) == a && cur(i + 1) == b) {
            out += a + b; hit = true; i += 2
          } else { out += cur(i); i += 1 }
        }
        if (hit) { cur = out.result(); changed = true }
      }
    }
    cur
  }

  /** Unigram-LM (SentencePiece-style) Viterbi segmentation of one word
    * under quantized integer piece scores — the per-word E-step of
    * text_unigram_train's hard-EM trainer and the encode loop of
    * text_unigram_apply. Maximizes the summed LmLogScale-grid log-prob
    * (exact Long addition — no floats anywhere in the DP); ties broken
    * by FEWER pieces, then by the LONGER last piece. Both tie-break
    * keys are additive/local, so the DP's optimal-substructure argument
    * holds and the chosen segmentation is a deterministic function of
    * (word, scores). The tie order also yields the checkable contract
    * text_unigram_apply's oracle pins: no two adjacent output pieces
    * may concatenate to an in-vocab piece with score >= their sum
    * (equal score + fewer pieces would already have won). Coverage is
    * the caller's contract: every single char of the word must be in
    * `scores` (the trainer never prunes single-char pieces). */
  def unigramSegment(w: String, scores: collection.Map[String, Long],
                     maxLen: Int): IndexedSeq[String] = {
    val n = w.length
    val NegInf = Long.MinValue / 4
    val dpScore = Array.fill(n + 1)(NegInf)
    val dpPieces = Array.fill(n + 1)(Int.MaxValue)
    val dpLast = Array.fill(n + 1)(0)
    dpScore(0) = 0L
    dpPieces(0) = 0
    var i = 1
    while (i <= n) {
      var l = 1
      val lMax = math.min(maxLen, i)
      while (l <= lMax) {
        val j = i - l
        if (dpScore(j) > NegInf) {
          scores.get(w.substring(j, i)) match {
            case Some(sc) =>
              val cs = dpScore(j) + sc
              val cp = dpPieces(j) + 1
              val better = cs > dpScore(i) ||
                (cs == dpScore(i) && (cp < dpPieces(i) ||
                  (cp == dpPieces(i) && l > dpLast(i))))
              if (better) {
                dpScore(i) = cs; dpPieces(i) = cp; dpLast(i) = l
              }
            case None => ()
          }
        }
        l += 1
      }
      i += 1
    }
    require(dpScore(n) > NegInf,
      s"unigram vocab does not cover '$w' — a single-char piece was pruned")
    var at = n
    val rev = List.newBuilder[String]
    while (at > 0) {
      val l = dpLast(at)
      rev += w.substring(at - l, at)
      at -= l
    }
    rev.result().reverse.toIndexedSeq
  }

  // ---------------------------------------------------------------------
  // Language-ID (marker-stopword heuristic)
  // ---------------------------------------------------------------------

  /** Marker stopwords per language — a tiny n-gram-free heuristic in the
    * spirit of classic stopword profilers. Deterministic tie-break: first
    * language in declaration order wins ties. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "es" -> Seq("el", "la", "de", "y", "es", "que", "un"),
    "zh" -> Seq("的", "是", "了", "不", "在", "we", "ni"))

  private def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers)))

  private def sqlMarkerCount(toks: String, markers: Seq[String]): String = {
    val arr = markers.map(m => s"'$m'").mkString("[", ", ", "]")
    s"len(list_filter($toks, t -> list_contains($arr, t)))"
  }

  /** Shared argmax fold over per-language scores (ties to the earlier
    * language in [[langMarkers]] order; 'und' when no marker hits). */
  private def langArgmax(scored: Seq[(String, Column)]): Column = {
    val best = scored.tail.foldLeft[(Column, Column)]((lit(scored.head._1), scored.head._2)) {
      case ((bl, bs), (l, s)) => (when(s > bs, lit(l)).otherwise(bl), greatest(s, bs))
    }
    when(best._2 === 0, lit("und")).otherwise(best._1)
  }

  /** Predicted language: argmax marker count, 'und' (undetermined) when no
    * marker hits at all. Marker counting runs as ONE codegen'd pass over
    * the token array ([[graft.functions.expr.MarkerCounts]]) instead of
    * four interpreted `size(filter(...))` higher-order evals per row
    * (r22, guide §4 — HOF lambdas run outside whole-stage codegen);
    * [[langIdHof]] keeps the built-in-composed form as the reference. */
  def langId(toks: Column): Column = {
    val counts = graft.functions.expr.MarkerCounts(toks, langMarkers.map(_._2))
    langArgmax(langMarkers.zipWithIndex.map { case ((l, _), i) =>
      (l, element_at(counts, i + 1))
    })
  }

  /** The higher-order-function twin of [[langId]] (4 interpreted
    * filter passes) — the property-tested reference implementation. */
  def langIdHof(toks: Column): Column =
    langArgmax(langMarkers.map { case (l, ms) => (l, markerCount(toks, ms)) })

  def sqlLangId(toks: String): String = {
    // Same left-fold argmax as langId, unrolled to nested CASEs.
    val scored = langMarkers.map { case (l, ms) => (l, sqlMarkerCount(toks, ms)) }
    var bl = s"'${scored.head._1}'"
    var bs = scored.head._2
    scored.tail.foreach { case (l, s) =>
      bl = s"CASE WHEN $s > $bs THEN '$l' ELSE $bl END"
      bs = s"greatest($s, $bs)"
    }
    s"CASE WHEN $bs = 0 THEN 'und' ELSE $bl END"
  }

  // ---------------------------------------------------------------------
  // Embedding ops (scaled-int exact arithmetic)
  // ---------------------------------------------------------------------

  /** Float vector → exact scaled BIGINT vector (×1e6, round-half-up). All
    * downstream dot products/norms are pure integer sums: order-independent,
    * bit-identical across engines, and < 2^53 so the final double cast is
    * exact. */
  def scaledVec(v: Column): Column =
    transform(v, x => round(x.cast("double") * 1e6).cast("long"))

  def sqlScaledVec(v: String): String =
    s"list_transform($v, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"

  /** Exact integer dot product of two scaled vectors, as DOUBLE — native
    * codegen'd expression ([[graft.functions.expr.DotLong]]). */
  def dotInt(a: Column, b: Column): Column =
    graft.functions.expr.DotLong(a, b).cast("double")

  /** Higher-order-function twin of [[dotInt]] (interpreted; the
    * composed-built-ins reference form DotLong is property-tested
    * against). */
  def dotIntHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
      .cast("double")

  def sqlDotInt(a: String, b: String, dim: Int): String =
    s"CAST(list_aggregate(list_transform(range(1, ${dim + 1}), " +
      s"i -> ($a)[i] * ($b)[i]), 'sum') AS DOUBLE)"

  /** Cosine similarity from exact integer dots: dot/(√‖a‖²·√‖b‖²). The two
    * sqrt calls and one divide are the only float ops — same IEEE tree both
    * engines. */
  def cosine(a: Column, b: Column): Column =
    dotInt(a, b) / (sqrt(dotInt(a, a)) * sqrt(dotInt(b, b)))

  def sqlCosine(a: String, b: String, dim: Int): String =
    s"${sqlDotInt(a, b, dim)} / (sqrt(${sqlDotInt(a, a, dim)}) * sqrt(${sqlDotInt(b, b, dim)}))"

  /** Deterministic ±1 random-hyperplane matrix for sign-LSH (seed shared
    * with the SQL twin). nBits × dim. */
  def hyperplanes(nBits: Int, dim: Int): IndexedSeq[IndexedSeq[Long]] = {
    val rnd = new scala.util.Random(1337)
    IndexedSeq.fill(nBits, dim)(if (rnd.nextBoolean()) 1L else -1L)
  }

  /** Sign-random-projection bucket id: bit i = [r_i · v > 0]. `table`
    * selects an independent hyperplane set (rows [table·nBits,
    * (table+1)·nBits) of the shared seeded matrix — row-major fill, so
    * table 0 is prefix-stable with the single-table form): multi-table
    * LSH trades index size for recall exactly like minhash bands. */
  def srpBucket(sv: Column, nBits: Int, dim: Int, table: Int = 0): Column = {
    val planes = hyperplanes((table + 1) * nBits, dim).drop(table * nBits)
    val bits = planes.zipWithIndex.map { case (row, i) =>
      val rowLit = array(row.map(lit): _*)
      when(dotInt(rowLit, sv) > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  def sqlSrpBucket(sv: String, nBits: Int, dim: Int, table: Int = 0): String = {
    val planes = hyperplanes((table + 1) * nBits, dim).drop(table * nBits)
    val bits = planes.zipWithIndex.map { case (row, i) =>
      val rowLit = row.mkString("[", ", ", "]")
      s"CASE WHEN ${sqlDotInt(rowLit, sv, dim)} > 0 THEN ${1L << i} ELSE 0 END"
    }
    bits.mkString("(", " + ", ")")
  }
}
