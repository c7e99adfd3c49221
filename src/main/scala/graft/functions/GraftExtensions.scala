package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions packaging of graft's native functions — the
  * deployment path for clusters that control session construction:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions()) ...
  * }}}
  *
  * Queries obtained through [[GraftFunctions.register]] remain the
  * runtime path when the session pre-exists (our driver contract).
  * Both routes register the identical builders.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def entry(name: String, clazz: Class[_],
      b: Seq[Expression] => Expression):
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), b)

  override def apply(e: SparkSessionExtensions): Unit = {
    import GraftFunctions.litIntParam
    e.injectFunction(entry("graft_dot", classOf[DotProduct],
      cs => DotProduct(cs(0), cs(1))))
    e.injectFunction(entry("graft_word_hashes", classOf[WordHashes],
      cs => WordHashes(cs(0))))
    e.injectFunction(entry("graft_shingles", classOf[ShingleHashes],
      cs => ShingleHashes(cs(0))))
    e.injectFunction(entry("graft_minhash", classOf[MinHashSig],
      cs => MinHashSig(cs(0), litIntParam(cs(1), "graft_minhash"))))
    e.injectFunction(entry("graft_hplane_sig", classOf[HyperplaneSig],
      cs => HyperplaneSig(cs(0), litIntParam(cs(1), "graft_hplane_sig"))))
    e.injectFunction(entry("graft_rsi_w", classOf[RsiWindow],
      cs => RsiWindow(cs(0))))
    e.injectFunction(entry("graft_cmo_w", classOf[CmoWindow],
      cs => CmoWindow(cs(0))))
    e.injectFunction(entry("graft_macd_hist_w", classOf[MacdHistWindow],
      cs => MacdHistWindow(cs(0))))
    e.injectFunction(entry("graft_adx_w", classOf[AdxWindow],
      cs => AdxWindow(cs(0), cs(1), cs(2))))
    e.injectFunction(entry("graft_adx_hist_w", classOf[AdxHistWindow],
      cs => AdxHistWindow(cs(0), cs(1), cs(2))))
    e.injectFunction(entry("graft_wilder_w", classOf[WilderPairWindow],
      cs => WilderPairWindow(cs(0))))
    e.injectFunction(entry("graft_adx_pair_w", classOf[AdxPairWindow],
      cs => AdxPairWindow(cs(0), cs(1), cs(2))))
  }
}
