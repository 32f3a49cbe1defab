"""Java DateTimeFormatter pattern support for TypingTransform.

The reference's schemas carry Java patterns (e.g. ``dd/MM/uuuu``,
``EEE MMM dd uuuu HH:mm:ss 'GMT'ZZZ '(Australian Eastern Standard Time)'`` —
reference: src/test/resources/userdata.json:60,95-99). Spark 3+/4 rejects
several Java tokens in *parsing* (notably day-of-week ``E``), so typing uses a
two-tier strategy:

1. translate the Java pattern to a Spark-compatible pattern when possible →
   native ``to_timestamp``/``to_date`` (JVM-side, codegen, fast path);
2. otherwise translate to a ``datetime.strptime`` format and parse in an
   Arrow-batched pandas UDF (slow path, only for exotic patterns).

This keeps the 100 TB hot path JVM-side: production schemas overwhelmingly use
plain numeric patterns, which tier 1 covers.
"""

from __future__ import annotations

# Tokens Spark's parser accepts (DatetimePatternsBehavior docs); 'u' means
# year-of-era in Java ('uuuu') which Spark models as 'y'.
_JAVA_TO_SPARK = {
    "uuuu": "yyyy",
    "uu": "yy",
}


def _tokenize(pattern: str):
    """Yield (kind, text) with kind ∈ {'literal', 'token'} for a Java pattern."""
    i = 0
    n = len(pattern)
    while i < n:
        ch = pattern[i]
        if ch == "'":
            j = i + 1
            lit = []
            while j < n:
                if pattern[j] == "'":
                    if j + 1 < n and pattern[j + 1] == "'":
                        lit.append("'")
                        j += 2
                        continue
                    break
                lit.append(pattern[j])
                j += 1
            yield ("literal", "".join(lit) if lit else "'")
            i = j + 1
        elif ch.isalpha():
            j = i
            while j < n and pattern[j] == ch:
                j += 1
            yield ("token", pattern[i:j])
            i = j
        else:
            yield ("literal", ch)
            i += 1


def java_to_spark_pattern(pattern: str) -> str | None:
    """Translate to a Spark-parseable pattern; None if unsupported tokens."""
    out = []
    for kind, text in _tokenize(pattern):
        if kind == "literal":
            if text == "'":
                out.append("''")
            elif any(c.isalpha() for c in text):
                out.append("'" + text + "'")
            else:
                out.append(text)
            continue
        t = text
        if t in _JAVA_TO_SPARK:
            out.append(_JAVA_TO_SPARK[t])
        elif t[0] in "GyMdHhmsSaDKkEecVzOXxZnNpqQwWuFY":
            # Spark rejects day-of-week & some exotic fields in parse mode
            if t[0] in "EecFnNpV":
                return None
            if t[0] == "u":  # handled above for uu/uuuu; other lengths → y
                out.append("y" * len(t))
            else:
                out.append(t)
        else:
            return None
    return "".join(out)


_JAVA_TO_STRPTIME = [
    ("uuuu", "%Y"),
    ("yyyy", "%Y"),
    ("uu", "%y"),
    ("yy", "%y"),
    ("MMMM", "%B"),
    ("MMM", "%b"),
    ("MM", "%m"),
    ("dd", "%d"),
    ("HH", "%H"),
    ("hh", "%I"),
    ("mm", "%M"),
    ("ss", "%S"),
    ("SSSSSS", "%f"),
    ("SSS", "%f"),
    ("EEEE", "%A"),
    ("EEE", "%a"),
    ("a", "%p"),
    ("ZZZZZ", "%z"),
    ("ZZZ", "%z"),
    ("ZZ", "%z"),
    ("Z", "%z"),
    ("XXX", "%z"),
    ("X", "%z"),
]


def java_to_strptime(pattern: str) -> str:
    """Translate a Java pattern to ``datetime.strptime`` format (python tier)."""
    out = []
    for kind, text in _tokenize(pattern):
        if kind == "literal":
            out.append(text.replace("%", "%%"))
            continue
        for java, py in _JAVA_TO_STRPTIME:
            if text == java:
                out.append(py)
                break
        else:
            # single-letter numeric tokens map to their 2-digit strptime code
            single = {"M": "%m", "d": "%d", "H": "%H", "m": "%M", "s": "%S", "h": "%I"}
            if text in single:
                out.append(single[text])
            else:
                raise ValueError(f"unsupported Java datetime token '{text}' in '{pattern}'")
    return "".join(out)
