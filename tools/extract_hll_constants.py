"""Extract Spark's HLL++ estimator constants from the installed Spark JVM.

Spark's ``approx_count_distinct`` above the linear-counting regime uses the
bias-corrected raw estimate from the HyperLogLog++ paper (Heule, Nunkesser,
Hall 2013): ``E' = alphaM2/zInverse - estimateBias(E)``, where the bias is a
K-nearest-neighbor window average over two empirical constant tables
(rawEstimateData / biasData, published in the paper's appendix and carried
verbatim in Apache Spark's public source,
sql/catalyst/.../util/HyperLogLogPlusPlusHelper.scala). Rather than
transcribing ~400 doubles by hand from the source, this one-off tool reads
them from the container's own spark-catalyst jar via py4j reflection —
guaranteeing the oracle uses bit-identical constants to the Spark actually
under test.

Prints a Python literal block for pasting into oracles_hll.py.

Usage: python tools/extract_hll_constants.py [p]   (default p=9)
"""

from __future__ import annotations

import sys

from otel_logger_spark.session import get_spark


def main() -> None:
    p = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    spark = get_spark("extract-hll-constants")
    jvm = spark._jvm
    helper_cls = (
        jvm.java.lang.Class.forName(
            "org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper$"
        )
    )
    module = helper_cls.getField("MODULE$").get(None)

    def read_field(name):
        f = helper_cls.getDeclaredField(name)
        f.setAccessible(True)
        return f.get(module)

    # Scala object's private vals compile to private fields on the $ class.
    names = [f.getName() for f in helper_cls.getDeclaredFields()]
    print("# fields on HyperLogLogPlusPlusHelper$:", names, file=sys.stderr)

    thresholds = list(read_field("THRESHOLDS"))
    raw_all = read_field("RAW_ESTIMATE_DATA")
    bias_all = read_field("BIAS_DATA")
    k = None
    for cand in ("K", "org$apache$spark$sql$catalyst$util$HyperLogLogPlusPlusHelper$$K"):
        try:
            k = read_field(cand)
            break
        except Exception:
            continue

    raw_p = list(raw_all[p - 4])
    bias_p = list(bias_all[p - 4])

    print(f"# Extracted from spark-catalyst {spark.version} (public Apache")
    print("# Spark constants, HLL++ paper appendix). p =", p)
    print(f"_THRESHOLD = {thresholds[p - 4]!r}")
    print(f"_KNN_K = {k!r}")
    print(f"_RAW_ESTIMATES = {raw_p!r}")
    print(f"_BIASES = {bias_p!r}")

    # Also dump the instance parameters Spark derives for relativeSD=0.05.
    inst = jvm.org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper(0.05)
    icls = inst.getClass()
    for fname in [f.getName() for f in icls.getDeclaredFields()]:
        fld = icls.getDeclaredField(fname)
        fld.setAccessible(True)
        try:
            print(f"# inst {fname} = {fld.get(inst)}", file=sys.stderr)
        except Exception as e:  # pragma: no cover
            print(f"# inst {fname}: <{e}>", file=sys.stderr)

    spark.stop()


if __name__ == "__main__":
    main()
