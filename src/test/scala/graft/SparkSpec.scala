package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (getOrCreate reuses one JVM-wide
  * session across suites in the forked test JVM).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config(Tables.NanosConf._1, Tables.NanosConf._2)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val Sf = "/root/testdata/sf0.001"

  /** Scratch dir under the build's target/ (inside the repo, never
    * the system temp dir).
    */
  def scratchDir(prefix: String): String = {
    val base = java.nio.file.Paths.get(sys.props("user.dir"), "target", "test-scratch")
    java.nio.file.Files.createDirectories(base)
    java.nio.file.Files.createTempDirectory(base, prefix).toString
  }
}
