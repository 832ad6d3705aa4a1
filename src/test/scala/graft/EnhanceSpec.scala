package graft

import org.apache.spark.sql.functions._
import graft.enhance.LocalStats

/** Micro-fixture pins for the enhance-tier fold plans; the sf-corpus
  * hash gates (a4/a5/a5b vs DuckDB) cover the full-scale semantics.
  */
class EnhanceSpec extends SparkSpec {
  import spark.implicits._

  test("A5 fold: border shrink, invalid exclusion, phantom drop — hand-checked 3×3") {
    // db(y,x) = 3y + x; (2,2) invalid
    val g = (for (y <- 0 to 2; x <- 0 to 2)
      yield (y, x, (3 * y + x).toDouble, !(y == 2 && x == 2)))
      .toDF("y", "x", "db", "valid")
    // r21: the fold normalizes coordinates to LONG (the Grid's native
    // type — registry output schema unchanged); int fixture columns
    // come back widened
    val r = LocalStats.statsOf(g).collect()
      .map(row => (row.getLong(0), row.getLong(1)) ->
        (row.getLong(2), row.getDouble(3), row.getDouble(4), row.getDouble(5))).toMap
    // the invalid center is DROPPED (8 rows), and no phantom positions
    // (-1,*) / (3,*) appear even though border stencils touch them
    assert(r.size == 8 && !r.contains((2L, 2L)), s"rows: ${r.keys}")
    // corner (0,0): neighborhood {0,1,3,4} → n=4, upper median vals[4/2]
    // (0-based) = vals[3rd 1-based] = 3, range 4, factor 1+0.1·(0−3)/4
    assert(r((0L, 0L)) == ((4L, 3.0, 4.0, 0.925)), s"corner: ${r((0L, 0L))}")
    // center (1,1): 8 valid of 9 → sorted [0..7], median vals[5] = 4,
    // range 7, factor 1 + 0.1·(4−4)/7 = 1
    assert(r((1L, 1L)) == ((8L, 4.0, 7.0, 1.0)), s"center: ${r((1L, 1L))}")
    // edge (2,1): neighborhood {3,4,5,6,7} (8 invalid... (2,2) excluded)
    // = rows 1..2, cols 0..2 minus (2,2) → {3,4,5,6,7}, n=5,
    // median vals[5 div 2 + 1] = vals[3] = 5, range 4,
    // factor 1 + 0.1·(7−5)/4 = 1.05
    assert(r((2L, 1L)) == ((5L, 5.0, 4.0, 1.05)), s"edge: ${r((2L, 1L))}")
  }

  test("A5 fold: all-invalid grid yields empty output; single-pixel grid is its own median") {
    val empty = Seq((0, 0, 1.0, false)).toDF("y", "x", "db", "valid")
    assert(LocalStats.statsOf(empty).count() == 0)
    val one = Seq((0, 0, 7.5, true)).toDF("y", "x", "db", "valid")
    val r = LocalStats.statsOf(one).collect()(0)
    // n=1, median = itself, range 0 → factor 1 (the range>0 guard)
    assert(r.getLong(2) == 1L && r.getDouble(3) == 7.5 &&
      r.getDouble(4) == 0.0 && r.getDouble(5) == 1.0)
  }
}
