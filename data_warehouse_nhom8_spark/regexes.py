"""Cross-engine pinned regex fragments (ADVICE r14).

Java (Spark) and RE2 (DuckDB) disagree on the ``\\s`` shorthand: Java's
matches vertical tab (``\\x0B``), RE2's does not — so any tokenization
contract verified across engines via a DuckDB oracle must spell the
whitespace class explicitly. Both engines parse the ``\\x0b`` hex escape
identically inside a character class, so one literal serves both:

* ``WS_SPLIT`` — pass directly to Java regex args (``F.split`` /
  ``F.regexp_replace``) and embed verbatim in DuckDB SQL text (DuckDB
  single-quoted literals do NOT unescape backslashes, RE2 sees them).
* ``WS_SPLIT_SQL`` — for patterns embedded in *Spark SQL* string
  literals (``F.expr`` bodies): Spark's parser unescapes one level of
  backslash first, so the source carries them doubled.

The class is ASCII-only on purpose: Java's default ``\\s`` is ASCII-only
too, and the Python twins (``re`` module) would otherwise drag unicode
whitespace (``\\xa0`` …) into the token split on one side only.
"""

# the explicit ASCII whitespace class, char-for-char what BOTH engines
# tokenize on: space, tab, newline, vertical tab, form feed, carriage
# return (Java \s; RE2 \s minus nothing — RE2's \s lacks \x0b)
WS_CHARS = r" \t\n\x0b\f\r"
WS_CLASS = "[" + WS_CHARS + "]"
WS_SPLIT = WS_CLASS + "+"

# the same pattern with backslashes doubled, for embedding inside a
# Spark SQL string literal (the SQL parser eats one escape level)
WS_CLASS_SQL = WS_CLASS.replace("\\", "\\\\")
WS_SPLIT_SQL = WS_CLASS_SQL + "+"
