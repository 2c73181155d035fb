package graft.style

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Derived styling columns (reference: arrow-cluster-layer
  * style-helpers.ts, SURVEY §2.5) — the layer's "SELECT list", expressed as
  * pure Catalyst column expressions (codegen'd, no UDFs).
  */
object Style {
  type Rgba = (Int, Int, Int, Int)

  /** D1: 3-way priority CASE — selected > focused/descendant > primary
    * (style-helpers.ts:11-47). Colors returned as array<int> RGBA.
    */
  def fillColor(
      id: Column,
      selectedId: Option[Long],
      focusedId: Option[Long],
      descendantIds: Seq[Long],
      selected: Rgba = (255, 140, 0, 255),
      focused: Rgba = (0, 180, 255, 255),
      primary: Rgba = (51, 136, 255, 200)): Column = {
    val isSelected = selectedId.map(id === _).getOrElse(lit(false))
    val isFocused = focusedId.map(id === _).getOrElse(lit(false)) ||
      (if (descendantIds.nonEmpty) id.isInCollection(descendantIds) else lit(false))
    fillColorWhen(isSelected, isFocused, selected, focused, primary)
  }

  /** D1 core as arbitrary predicates (the id-based variant above is the
    * reference's exact surface; this one lets callers drive selection from
    * any column expression — both hit the same priority CASE).
    */
  def fillColorWhen(
      isSelected: Column,
      isFocused: Column,
      selected: Rgba = (255, 140, 0, 255),
      focused: Rgba = (0, 180, 255, 255),
      primary: Rgba = (51, 136, 255, 200)): Column = {
    def arr(c: Rgba): Column = array(lit(c._1), lit(c._2), lit(c._3), lit(c._4))
    when(isSelected, arr(selected)).when(isFocused, arr(focused)).otherwise(arr(primary))
  }

  /** D2: log-scaled radius `4 + ln(count+1)/ln(total+1)·50`
    * (style-helpers.ts:60-66; exact formula test style-helpers.test.ts:161-169).
    * `total` is a scalar (indexed point count) — broadcast by Catalyst as a
    * literal, no per-row recompute.
    */
  def radius(pointCount: Column, totalPoints: Long): Column =
    lit(4.0) + log(pointCount.cast("double") + 1.0) / math.log(totalPoints.toDouble + 1.0) * 50.0

  /** sRGB channel linearization (style-helpers.ts:75-78). */
  private def linearize(channel: Column): Column = {
    val c = channel.cast("double") / 255.0
    when(c <= 0.03928, c / 12.92).otherwise(pow((c + 0.055) / 1.055, 2.4))
  }

  /** WCAG relative luminance, Rec.709 weights (style-helpers.ts:98-99). */
  def luminance(r: Column, g: Column, b: Column): Column =
    linearize(r) * 0.2126 + linearize(g) * 0.7152 + linearize(b) * 0.0722

  /** D3: black-on-light / white-on-dark text color from fill luminance
    * (style-helpers.ts:75-109). fill is array<int> RGBA.
    */
  def textColor(fill: Column, threshold: Double = 0.5): Column =
    when(luminance(fill(0), fill(1), fill(2)) > threshold,
      array(lit(0), lit(0), lit(0), lit(255)))
      .otherwise(array(lit(255), lit(255), lit(255), lit(255)))

  /** D4: label text — count for clusters, null for points
    * (style-helpers.ts:114-123).
    */
  def labelText(isCluster: Column, pointCount: Column): Column =
    when(isCluster, pointCount.cast("string"))

  /** D5: cluster-only predicate for the text sublayer
    * (arrow-cluster-layer.ts:202-207).
    */
  def clustersOnly(isCluster: Column): Column = isCluster
}
