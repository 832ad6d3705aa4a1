package graft

import graft.api.Engine
import graft.cli.Cli
import graft.meta.SafeMeta
import graft.model._

/** The error taxonomy is only worth having if every variant is reachable
  * from a real user action — each test here drives one through its
  * public surface (`error.rs:8-46`, `sentinel1.rs:20-35`,
  * `cli/errors.rs:5-31` semantics).
  */
class ErrorsSpec extends SparkSpec {

  test("CLI: invalid enum values are InvalidArgument with the flag name") {
    val r = Cli.parse(Seq("-i", "a:1:1", "-o", "b", "--polarization", "zz"))
    r match {
      case Left(GraftException.InvalidArgument(arg, v)) =>
        assert(arg == "polarization" && v == "zz")
      case other => fail(s"expected InvalidArgument, got $other")
    }
    assert(Cli.parse(Seq("-i", "a:1:1", "-o", "b", "--size", "nope"))
      .swap.exists(_.isInstanceOf[GraftException.InvalidArgument]))
    assert(Cli.parse(Seq("-i", "a:1:1", "-o", "b", "--resample-alg", "spline"))
      .swap.exists(_.isInstanceOf[GraftException.InvalidArgument]))
  }

  test("CLI: --size 0 is the dedicated ZeroSize error (cli/runner.rs:51)") {
    Cli.parse(Seq("-i", "a:1:1", "-o", "b", "--size", "0")) match {
      case Left(e: GraftException.ZeroSize) =>
        assert(e.getMessage == "Size must be greater than 0, got: 0")
      case other => fail(s"expected ZeroSize, got $other")
    }
  }

  test("CLI: absent required flags are MissingArgument per flag") {
    assert(Cli.parse(Seq("-i", "a:1:1")) ==
      Left(GraftException.MissingArgument("output")))
    assert(Cli.parse(Seq("-o", "b")) ==
      Left(GraftException.MissingArgument("input")))
    assert(Cli.parse(Seq("--batch", "--output-dir", "d")) ==
      Left(GraftException.MissingArgument("input-dir")))
    assert(Cli.parse(Seq("--batch", "--input-dir", "d")) ==
      Left(GraftException.MissingArgument("output-dir")))
  }

  test("SAFE-style product ids declare their product type") {
    assert(SafeMeta.productTypeFromId("S1A_IW_GRDH_1SDV_20240101").contains("GRD"))
    assert(SafeMeta.productTypeFromId("S1B_EW_GRDM_1SDH_x").contains("GRD"))
    assert(SafeMeta.productTypeFromId("S1A_IW_SLC__1SDV_x").contains("SLC"))
    assert(SafeMeta.productTypeFromId("S1A_WV_OCN__2SSV_x").contains("OCN"))
    assert(SafeMeta.productTypeFromId("plainid").isEmpty)
    assert(SafeMeta.productTypeFromId("p1").isEmpty)
  }

  test("non-GRD product type is UnsupportedProduct from both API paths") {
    val meta = SafeMeta(productType = Some("SLC"))
    intercept[GraftException.UnsupportedProduct] {
      Engine.processToBuffer(spark, "p", 8, 8, ProcessingParams(
        autoscale = AutoscaleStrategy.Standard), meta)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-err").toString
    intercept[GraftException.UnsupportedProduct] {
      Engine.processToPath(spark, "p", 8, 8, s"$dir/x.tiff", ProcessingParams(
        autoscale = AutoscaleStrategy.Standard), meta)
    }
  }

  test("batch counts an SLC-named product as SKIPPED, not an error (api/mod.rs:502-532)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-batch-skip").toString
    val report = Engine.processDirectory(spark,
      Seq(("S1A_IW_SLC__1SDV_a", 8, 8), ("ok_prod", 8, 8)), dir,
      ProcessingParams(autoscale = AutoscaleStrategy.Standard))
    assert(report.skipped == 1, report)
    assert(report.processed == 1, report)
    assert(report.errors.isEmpty, report)
  }

  test("openProduct without a measurement directory is MissingField (sentinel1.rs:144-149)") {
    val e = intercept[GraftException.MissingField] {
      graft.sources.TiffSource.openProduct(spark, "/nonexistent/measurement", "vv")
    }
    assert(e.getMessage == "Missing field `measurement directory` in SAFE metadata")
  }

  test("Grid.df survives an empty lineitem relation (max key null)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty-li").toString
    spark.range(0)
      .selectExpr("id AS l_orderkey", "CAST(id AS INT) AS l_linenumber",
        "CAST(id AS DOUBLE) AS l_extendedprice")
      .write.parquet(s"$dir/lineitem.parquet")
    assert(graft.enhance.Grid.df(spark, dir).count() == 0L)
  }
}
