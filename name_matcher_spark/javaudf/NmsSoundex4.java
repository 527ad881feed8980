package nms;

import org.apache.spark.sql.api.java.UDF1;

/**
 * Reference-exact 4-char blocking soundex (src/matching/mod.rs:1227-1238;
 * Python mirror name_matcher_spark/functions/phonetic.py::soundex4).
 *
 * NOT standard Soundex: only ASCII letters are considered, and ANY
 * non-coded letter (vowels, h, w, y) resets the adjacent-duplicate
 * state. Empty / letter-free input codes as "0000". Differential-tested
 * against the Python mirror in tests/test_phonetic.py.
 */
public class NmsSoundex4 implements UDF1<String, String> {

  private static int code(int lc) {
    switch (lc) {
      case 'b': case 'f': case 'p': case 'v':
        return 1;
      case 'c': case 'g': case 'j': case 'k':
      case 'q': case 's': case 'x': case 'z':
        return 2;
      case 'd': case 't':
        return 3;
      case 'l':
        return 4;
      case 'm': case 'n':
        return 5;
      case 'r':
        return 6;
      default:
        return 0;
    }
  }

  public static String soundex4(String s) {
    char[] out = {'0', '0', '0', '0'};
    if (s == null || s.isEmpty()) {
      return new String(out);
    }
    int n = s.length();
    char first = 0;
    int idx = 1;
    int last = 0;
    for (int i = 0; i < n; i++) {
      char c = s.charAt(i);
      boolean alpha = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z');
      if (!alpha) {
        continue;
      }
      if (first == 0) {
        first = Character.toUpperCase(c);
        out[0] = first;
        continue;
      }
      if (idx >= 4) {
        break;
      }
      int d = code(Character.toLowerCase(c));
      if (d != 0 && d != last) {
        out[idx] = (char) ('0' + d);
        idx++;
      }
      last = d;
    }
    return new String(out);
  }

  @Override
  public String call(String s) {
    return soundex4(s);
  }
}
