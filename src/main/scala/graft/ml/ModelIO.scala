package graft.ml

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import breeze.linalg.DenseMatrix
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.ml.TimeSeries.VarModel

/** Model persistence (SURVEY §2 S11) — the engine's analogue of the
  * reference's `model.save(".h5")` (`train.py:271`): the fitted VAR
  * coefficient matrix and the robust-scaler statistics serialize to one
  * JSON document and reload into a model whose forecasts are bit-identical
  * to the fitted one's.
  *
  * Exactness: every double is written with `java.lang.Double.toString`
  * (the shortest decimal that parses back to the same IEEE-754 value) and
  * read with `Double.parseDouble`, so the round-trip preserves bits — a
  * reloaded model scores exactly like the one in memory, which is what
  * lets `ml_var_hybrid` run its forecasts through the persistence path
  * without changing a single output row.
  *
  * Durability: the file is written to a temp sibling and atomically moved
  * into place, so readers never observe a partial model and an interrupted
  * save leaves the previous version intact.
  */
object ModelIO {

  /** Robust-scaler statistics (per-feature median and IQR range) — the
    * reference fits these on the train split only (`train.py:193-196`). */
  final case class ScalerParams(median: Array[Double], range: Array[Double])

  /** A persisted bundle: the VAR model plus (optionally) the scaler that
    * produced its training inputs — reloading one without the other cannot
    * reproduce scores on raw data. */
  final case class Bundle(model: VarModel, scaler: Option[ScalerParams])

  private def jsArr(xs: Iterator[Double]): String =
    xs.map(java.lang.Double.toString).mkString("[", ",", "]")

  def save(model: VarModel, scaler: Option[ScalerParams], path: String): Unit = {
    val coefRows = (0 until model.dim).map { i =>
      jsArr((0 until model.coef.cols).iterator.map(j => model.coef(i, j)))
    }.mkString("[", ",", "]")
    val scalerJson = scaler match {
      case Some(sp) =>
        s""","scaler":{"median":${jsArr(sp.median.iterator)},"range":${jsArr(sp.range.iterator)}}"""
      case None => ""
    }
    val json =
      s"""{"format":"graft-var","version":1,"p":${model.p},"dim":${model.dim},"coef":$coefRows$scalerJson}"""
    val target = Paths.get(path)
    if (target.getParent != null) Files.createDirectories(target.getParent)
    val tmp = Files.createTempFile(
      if (target.getParent != null) target.getParent else Paths.get("."),
      target.getFileName.toString, ".tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def doubles(node: JsonNode): Array[Double] = {
    val out = new Array[Double](node.size())
    var i = 0
    while (i < out.length) {
      // asText + parseDouble (not asDouble): preserves the writer's exact
      // shortest-repr round-trip for every IEEE value including -0.0.
      out(i) = java.lang.Double.parseDouble(node.get(i).asText())
      i += 1
    }
    out
  }

  /** Persist a trained neural net as (architecture dims, flat weight
    * vector) — the engine's counterpart of the reference's `.h5` save for
    * the GRU/TFT models. Same exactness contract as the VAR path:
    * shortest-repr doubles, atomic move, bit-identical reload. */
  def saveNet(dims: Seq[Int], weights: Array[Double], kind: String,
              path: String): Unit = {
    // kind is interpolated into the JSON document verbatim: restrict it to
    // a charset that can never need escaping (round-6 ADVICE).
    require(kind.matches("[A-Za-z0-9_-]+"),
      s"net kind must be [A-Za-z0-9_-]+, got '$kind'")
    val json =
      s"""{"format":"graft-net","version":1,"kind":"$kind",""" +
        s""""n":${weights.length},""" +
        s""""dims":${dims.mkString("[", ",", "]")},""" +
        s""""weights":${jsArr(weights.iterator)}}"""
    val target = Paths.get(path)
    if (target.getParent != null) Files.createDirectories(target.getParent)
    val tmp = Files.createTempFile(
      if (target.getParent != null) target.getParent else Paths.get("."),
      target.getFileName.toString, ".tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Reload a [[saveNet]] bundle. Validates the kind tag, the declared
    * weight count `n` against the parsed array (a shorter-but-parseable
    * weights array surfaces here as a clear load error instead of an
    * index crash deep inside predict — round-6 ADVICE), and, when the
    * caller knows it, `expectedWeights` against the architecture's
    * parameter count. */
  def loadNet(path: String, kind: String,
              expectedWeights: Option[Int] = None): (Seq[Int], Array[Double]) = {
    val root = new ObjectMapper()
      .readTree(Files.readAllBytes(Paths.get(path)))
    require(root.path("format").asText() == "graft-net",
      s"$path is not a graft net model file")
    require(root.path("kind").asText() == kind,
      s"$path holds a '${root.path("kind").asText()}' net, expected '$kind'")
    val dimsNode = root.get("dims")
    val dims = (0 until dimsNode.size()).map(dimsNode.get(_).asInt())
    val weights = doubles(root.get("weights"))
    val declared = root.path("n").asInt(weights.length)
    require(weights.length == declared,
      s"$path declares $declared weights but carries ${weights.length}")
    expectedWeights.foreach(n => require(weights.length == n,
      s"$path carries ${weights.length} weights, architecture expects $n"))
    (dims, weights)
  }

  def load(path: String): Bundle = {
    val root = new ObjectMapper()
      .readTree(Files.readAllBytes(Paths.get(path)))
    require(root.path("format").asText() == "graft-var",
      s"$path is not a graft VAR model file")
    val p = root.get("p").asInt()
    val dim = root.get("dim").asInt()
    val coefNode = root.get("coef")
    val k = 1 + dim * p
    val coef = DenseMatrix.zeros[Double](dim, k)
    (0 until dim).foreach { i =>
      val row = doubles(coefNode.get(i))
      require(row.length == k, s"coef row $i has ${row.length} cols, expected $k")
      (0 until k).foreach(j => coef(i, j) = row(j))
    }
    val scaler = Option(root.get("scaler")).map { sn =>
      ScalerParams(doubles(sn.get("median")), doubles(sn.get("range")))
    }
    Bundle(VarModel(p, dim, coef), scaler)
  }
}
