package nms;

import org.apache.spark.sql.Row;
import org.apache.spark.sql.RowFactory;
import org.apache.spark.sql.api.java.UDF11;

/**
 * The full fuzzy decision ladder fused into one JVM kernel — the batch
 * analogue of the reference's fused GPU kernel (mod.rs:1304-1359), with
 * exact semantics of fuzzy_compare_names_new / _no_mid
 * (mod.rs:101-141, 207-233):
 *
 *   lev  = (1 - levenshtein_chars(full1, full2) / max(utf8_bytes)) * 100
 *   jw   = strsim jaro_winkler(full1, full2) * 100
 *   mp   = 100 iff precomputed Double Metaphone codes non-empty + equal
 *   DIRECT (equal fulls) -> 100 | CASE 1 | CASE 2 | CASE 3 ladder
 *
 * Inputs are the prepare-stage derived columns; returns null when the
 * pair is not a match (dropped by the caller's filter). One invocation
 * per candidate pair; all scratch arrays are local primitives, so the
 * allocation profile stays flat no matter how many ladder predicates
 * reference the result.
 */
public class NmsFuzzyScore
    implements UDF11<String, String, String, String, String, String, String,
        String, String, String, Boolean, Row> {

    @Override
    public Row call(
            String full1, String full2, String dmeta1, String dmeta2,
            String sf1, String sf2, String sm1, String sm2,
            String sl1, String sl2, Boolean includeMiddle) {
        if (full1 == null) full1 = "";
        if (full2 == null) full2 = "";
        if (full1.trim().isEmpty() || full2.trim().isEmpty()) return null;

        if (full1.equals(full2)) {
            return RowFactory.create(100.0, "DIRECT MATCH");
        }

        int[] c1 = full1.codePoints().toArray();
        int[] c2 = full2.codePoints().toArray();
        int maxBytes = Math.max(utf8Len(c1), utf8Len(c2));
        double lev = maxBytes == 0
            ? 100.0
            : (1.0 - (double) levenshtein(c1, c2) / maxBytes) * 100.0;
        double jw = NmsJaroWinkler.jaroWinkler(full1, full2) * 100.0;
        boolean mpEq = dmeta1 != null && !dmeta1.isEmpty() && dmeta1.equals(dmeta2);
        double mp = mpEq ? 100.0 : 0.0;

        int passes = 0;
        if (lev >= 85.0) passes++;
        if (jw >= 85.0) passes++;
        if (mpEq) passes++;

        if (lev >= 85.0 && jw >= 85.0 && mpEq) {
            return RowFactory.create((lev + jw + mp) / 3.0, "CASE 1");
        }
        if (passes >= 2) {
            double avg = (lev + jw + mp) / 3.0;
            if (avg >= 88.0) {
                boolean fieldsOk =
                    levenshtein(cp(sf1), cp(sf2)) <= 2
                    && levenshtein(cp(sl1), cp(sl2)) <= 2;
                if (fieldsOk && Boolean.TRUE.equals(includeMiddle)) {
                    fieldsOk = levenshtein(cp(sm1), cp(sm2)) <= 2;
                }
                if (fieldsOk) return RowFactory.create(avg, "CASE 3");
            }
            return RowFactory.create(avg, "CASE 2");
        }
        return null;
    }

    private static int[] cp(String s) {
        return (s == null ? "" : s).codePoints().toArray();
    }

    private static int utf8Len(int[] cps) {
        int n = 0;
        for (int c : cps) {
            if (c < 0x80) n += 1;
            else if (c < 0x800) n += 2;
            else if (c < 0x10000) n += 3;
            else n += 4;
        }
        return n;
    }

    /** Char(codepoint)-based Levenshtein, two-row DP. */
    static int levenshtein(int[] a, int[] b) {
        int la = a.length, lb = b.length;
        if (la == 0) return lb;
        if (lb == 0) return la;
        int[] prev = new int[lb + 1];
        int[] cur = new int[lb + 1];
        for (int j = 0; j <= lb; j++) prev[j] = j;
        for (int i = 1; i <= la; i++) {
            cur[0] = i;
            int ai = a[i - 1];
            for (int j = 1; j <= lb; j++) {
                int cost = (ai == b[j - 1]) ? 0 : 1;
                int v = prev[j] + 1;
                if (cur[j - 1] + 1 < v) v = cur[j - 1] + 1;
                if (prev[j - 1] + cost < v) v = prev[j - 1] + cost;
                cur[j] = v;
            }
            int[] t = prev;
            prev = cur;
            cur = t;
        }
        return prev[lb];
    }
}
