package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (one JVM-wide session, scalatest runs
  * suites sequentially in one forked JVM — `build.sbt` Test/fork). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  // Keep the shared session alive across suites, but drain any staged
  // localCheckpoint blocks a suite's queries created (suites that run
  // query fns without a Verify/Bench-style runner would otherwise pin
  // blocks in the registry for the whole test JVM).
  override def afterAll(): Unit = graft.queries.QuerySpec.releaseStaged()
}

object SparkSpec {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    // Match the bench/verify sessions' scale-adaptive AQE coalescing
    // (Bench.scala r22): plan pins and shuffle ceilings must hold under
    // the partitioning regime the bench actually times.
    .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
      sys.env.getOrElse("GRAFT_AQE_PARALLELISM_FIRST", "false"))
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("graft-test")
    .getOrCreate()
}
