package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model._

/** Pure param-ADT specs (no Spark). */
class ModelSpec extends AnyFunSuite {

  test("polarization round-trips every CLI name") {
    Seq("vv", "vh", "hh", "hv", "multiband").foreach { n =>
      assert(Polarization.fromString(n).exists(_.name == n))
    }
    Seq("sum", "diff", "ratio", "n-diff", "log-ratio").foreach { n =>
      assert(Polarization.fromString(n).exists {
        case Polarization.Op(op) => op.name == n
        case _ => false
      })
    }
    assert(Polarization.fromString("VV").isDefined, "case-insensitive")
    assert(Polarization.fromString("bogus").isEmpty)
  }

  test("autoscale strategies cover the reference's seven") {
    assert(AutoscaleStrategy.all.map(_.name).sorted ==
      Seq("adaptive", "clahe", "default", "equalized", "robust", "standard", "tamed"))
    assert(AutoscaleStrategy.fromString("CLAHE").contains(AutoscaleStrategy.Clahe))
  }

  test("bit depth max values") {
    assert(BitDepth.U8.maxVal == 255.0 && BitDepth.U16.maxVal == 65535.0)
  }

  test("defaults match the reference (params.rs:26-41)") {
    val p = ProcessingParams()
    assert(p.polarization == Polarization.Vv)
    assert(p.autoscale == AutoscaleStrategy.Clahe)
    assert(p.bitDepth == BitDepth.U8)
    assert(p.format == OutputFormat.Tiff)
    assert(!p.pad && p.targetSize.isEmpty)
  }

  test("operation labels mirror save.rs:35-48") {
    assert(ProcessingOperation.PolarOp(PolarizationOperation.NDiff).label.contains("normalized_diff"))
    assert(ProcessingOperation.MultibandVvVh.label.contains("multiband_vv_vh"))
    assert(ProcessingOperation.SingleBand.label.isEmpty)
  }
}
