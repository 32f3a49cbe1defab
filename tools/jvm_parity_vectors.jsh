// JVM parity-vector generator for the reference's mask encode layer.
//
// Executes the EXACT expressions from the reference
// (src/main/scala/ai/tripl/arc/udf/MaskDataPlugin.scala:70-92,114-122) on a
// real JVM over synthetic KDF digests, so the Python port's byte->alphabet
// mapping, signed-long day shifts, and Scala-BigDecimal remainder semantics
// are checked against actual JVM behavior rather than a re-derivation.
// (The full BouncyCastle KDF stack is not resolvable offline — see
// FIXTURES.md — so digests are synthetic: digest[i] of vector v is
// (byte)((v * 131 + i * 31 + 7) % 256), covering every signed-byte value
// across the set, including -128 and -1.)
//
// Run: jshell --execution local -q tools/jvm_parity_vectors.jsh > tests/fixtures/jvm_parity.json
import java.math.BigDecimal;
import java.math.MathContext;
import java.nio.ByteBuffer;
import java.time.LocalDate;

byte[] digest(int v) {
    byte[] d = new byte[64];
    for (int i = 0; i < 64; i++) d[i] = (byte)((v * 131 + i * 31 + 7) % 256);
    return d;
}

// MaskDataPlugin.encodeAsString: alphabet(Math.abs(byte.toInt) % alphabet.length)
String encodeAsString(byte[] bytes, String alphabet) {
    StringBuilder sb = new StringBuilder();
    for (byte b : bytes) sb.append(alphabet.charAt(Math.abs((int) b) % alphabet.length()));
    return sb.toString();
}

long hashLong(byte[] d) { return ByteBuffer.wrap(d).getLong(); }  // first 8, signed BE

String q(String s) { return "\"" + s + "\""; }

StringBuilder out = new StringBuilder("{\n");

// --- encodeAsString + truncate(16) over alphabets, incl. short ones -------
String[] alphabets = {
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ",
    "0123456789",
    "ab",
    "0123456789abcdef"
};
out.append(q("mask_string")).append(": [\n");
boolean first = true;
for (int v = 0; v < 8; v++) {
    for (String a : alphabets) {
        String enc = encodeAsString(digest(v), a);
        if (!first) out.append(",\n");
        first = false;
        out.append("  {").append(q("vector")).append(": ").append(v)
           .append(", ").append(q("alphabet")).append(": ").append(q(a))
           .append(", ").append(q("full")).append(": ").append(q(enc))
           .append(", ").append(q("truncated16")).append(": ").append(q(enc.substring(0, 16)))
           .append("}");
    }
}
out.append("\n],\n");

// --- mask_date: numDays = (hashLong % range).toInt; LocalDate.plusDays ----
out.append(q("mask_date")).append(": [\n");
String[] dates = {"2016-12-18", "2020-02-29", "1970-01-01"};
int[] ranges = {365, 30, 1, 7};
first = true;
for (int v = 0; v < 8; v++) {
    long hl = hashLong(digest(v));
    for (String ds : dates) {
        for (int r : ranges) {
            int numDays = (int)(hl % r);
            String shifted = LocalDate.parse(ds).plusDays(numDays).toString();
            if (!first) out.append(",\n");
            first = false;
            out.append("  {").append(q("vector")).append(": ").append(v)
               .append(", ").append(q("hashLong")).append(": ").append(hl)
               .append(", ").append(q("date")).append(": ").append(q(ds))
               .append(", ").append(q("range")).append(": ").append(r)
               .append(", ").append(q("numDays")).append(": ").append(numDays)
               .append(", ").append(q("masked")).append(": ").append(q(shifted))
               .append("}");
        }
    }
}
out.append("\n],\n");

// --- mask_decimal: scala (BigDecimal(long) / pow(10,scale)) % range + value
// scala./ uses MathContext.DECIMAL128 (HALF_EVEN, 34 digits); % and + exact.
out.append(q("mask_decimal")).append(": [\n");
String[][] decimals = {
    {"1234.56", "100"}, {"0.01", "1"}, {"-987.654", "500"},
    {"99999999.99", "1000"}, {"3.14159", "2"}
};
first = true;
for (int v = 0; v < 8; v++) {
    long hl = hashLong(digest(v));
    for (String[] pair : decimals) {
        BigDecimal value = new BigDecimal(pair[0]);
        BigDecimal range = new BigDecimal(pair[1]);
        BigDecimal randomDecimal = new BigDecimal(hl).divide(
            new BigDecimal(Math.pow(10, value.scale())), MathContext.DECIMAL128);
        BigDecimal masked = value.add(randomDecimal.remainder(range));
        if (!first) out.append(",\n");
        first = false;
        out.append("  {").append(q("vector")).append(": ").append(v)
           .append(", ").append(q("hashLong")).append(": ").append(hl)
           .append(", ").append(q("value")).append(": ").append(q(pair[0]))
           .append(", ").append(q("range")).append(": ").append(q(pair[1]))
           .append(", ").append(q("masked")).append(": ").append(q(masked.toString()))
           .append("}");
    }
}
out.append("\n]\n}");
System.out.println(out);
/exit
