package nms;

import org.apache.spark.sql.api.java.UDF2;

/**
 * Jaro-Winkler percent with strsim 0.11 parity (the reference's
 * dependency): standard Jaro over Unicode scalar values, then
 * jw = jaro + prefix * 0.1 * (1 - jaro) with common prefix capped at 4
 * and NO 0.7 boost threshold; result clamped to 1.0, scaled to 0-100.
 *
 * Compiled at session bootstrap (tools/build_java_udfs.py) so the
 * entire fuzzy-ladder pair scoring runs JVM-side — no Python worker
 * round trip in the candidate hot path. Differential-tested against
 * the Python mirror in tests/test_similarity.py.
 */
public class NmsJaroWinkler implements UDF2<String, String, Double> {

    @Override
    public Double call(String a, String b) {
        if (a == null) a = "";
        if (b == null) b = "";
        return jaroWinkler(a, b) * 100.0;
    }

    public static double jaroWinkler(String a, String b) {
        double sj = jaro(a, b);
        int[] ca = a.codePoints().toArray();
        int[] cb = b.codePoints().toArray();
        int prefix = 0;
        int n = Math.min(Math.min(ca.length, cb.length), 4);
        for (int i = 0; i < n; i++) {
            if (ca[i] == cb[i]) prefix++;
            else break;
        }
        double jw = sj + prefix * 0.1 * (1.0 - sj);
        return Math.min(jw, 1.0);
    }

    public static double jaro(String a, String b) {
        if (a.equals(b)) return 1.0;
        int[] ca = a.codePoints().toArray();
        int[] cb = b.codePoints().toArray();
        int la = ca.length, lb = cb.length;
        if (la == 0 || lb == 0) return 0.0;
        int window = Math.max(la, lb) / 2 - 1;
        if (window < 0) window = 0;
        boolean[] bMatched = new boolean[lb];
        int[] aSeq = new int[Math.min(la, lb)];
        int m = 0;
        for (int i = 0; i < la; i++) {
            int lo = Math.max(0, i - window);
            int hi = Math.min(lb, i + window + 1);
            for (int j = lo; j < hi; j++) {
                if (!bMatched[j] && cb[j] == ca[i]) {
                    bMatched[j] = true;
                    aSeq[m++] = ca[i];
                    break;
                }
            }
        }
        if (m == 0) return 0.0;
        int transpositions = 0;
        int k = 0;
        for (int j = 0; j < lb; j++) {
            if (bMatched[j]) {
                if (aSeq[k] != cb[j]) transpositions++;
                k++;
            }
        }
        double mm = m;
        return (mm / la + mm / lb + (mm - transpositions / 2) / mm) / 3.0;
    }
}
