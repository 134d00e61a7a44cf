"""Business parsers as *native column expressions* — not Python UDFs.

The reference implements these as row-at-a-time Python inside a
fetchall loop (reference staging/staging_transformer_v2.py:53-75).
Re-expressed as Catalyst expressions they stay inside whole-stage
codegen (no Python worker round-trip), which is the difference
between "works on 60k rows" and "works on 100 TB".

Contracts (from reference staging/staging_transformer_v2.py):

``clean_salary`` (:53-62) — input like ``"10 - 15 triệu"``:
  * lowercase, strip ``,`` and ``.`` thousand separators
  * ``"thỏa thuận"`` (negotiable)          → (0, 0)
  * ``"tới N"`` / ``"lên tới N"`` (up to)  → (0, N·1e6)
  * ``"trên N"`` (above)                   → (N·1e6, 0)
  * ``"N - M"``                            → (N·1e6, M·1e6)
  * single number ``"N"``                  → (N·1e6, N·1e6)
  * no digits / NULL                       → (NULL, NULL)

``calc_posted_date`` (:64-75) — relative posted_time vs extract date:
  * ``"hôm qua"`` (yesterday)              → extract_date - 1 day
  * ``"N ngày trước"`` (N days ago)        → extract_date - N days
  * ``"N tuần trước"`` (N weeks ago)       → extract_date - 7N days
  * ``"hôm nay"`` / ``"vừa xong"`` / today-ish with no number → extract_date
  * anything unparseable                   → NULL
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from data_warehouse_nhom8_spark.regexes import WS_SPLIT

MILLION = 1_000_000


def _nums(c: Column) -> Column:
    """All integer runs in the text, as an array<string> (re.findall twin)."""
    return F.regexp_extract_all(c, F.lit(r"(\d+)"), 1)


def clean_salary_cols(salary: Column | str) -> tuple[Column, Column]:
    """(salary_min, salary_max) in VND as LongType expressions."""
    s = F.col(salary) if isinstance(salary, str) else salary
    txt = F.lower(F.regexp_replace(F.trim(s), r"[,\.]", ""))
    nums = _nums(txt)
    n0 = F.element_at(nums, 1).cast("long")
    n1 = F.element_at(nums, 2).cast("long")
    has0 = F.size(nums) >= 1
    has1 = F.size(nums) >= 2

    is_negotiable = txt.contains("thỏa thuận") | txt.contains("thoả thuận")
    is_upto = txt.contains("tới") | txt.contains("đến")
    is_above = txt.contains("trên")

    # Two numbers always mean a range — "10 đến 15 triệu" is a range
    # even though "đến" alone (with one number) marks an up-to bound,
    # so the range branch must precede the up-to branch.
    salary_min = (
        F.when(s.isNull() | (txt == ""), F.lit(None).cast("long"))
        .when(is_negotiable, F.lit(0))
        .when(has1, n0 * MILLION)
        .when(is_upto & has0, F.lit(0))
        .when(is_above & has0, n0 * MILLION)
        .when(has0, n0 * MILLION)
        .otherwise(F.lit(None).cast("long"))
    )
    salary_max = (
        F.when(s.isNull() | (txt == ""), F.lit(None).cast("long"))
        .when(is_negotiable, F.lit(0))
        .when(has1, n1 * MILLION)
        .when(is_upto & has0, n0 * MILLION)
        .when(is_above & has0, F.lit(0))
        .when(has0, n0 * MILLION)
        .otherwise(F.lit(None).cast("long"))
    )
    return salary_min, salary_max


def posted_date_col(posted_time: Column | str, extract_date: Column | str) -> Column:
    """Resolved posting date (DateType) from a relative description."""
    p = F.col(posted_time) if isinstance(posted_time, str) else posted_time
    d = F.col(extract_date) if isinstance(extract_date, str) else extract_date
    d = d.cast("date")
    txt = F.lower(F.trim(p))
    n = F.coalesce(F.element_at(_nums(txt), 1).cast("int"), F.lit(0))

    return (
        F.when(txt.isNull() | (txt == ""), F.lit(None).cast("date"))
        .when(txt.contains("hôm qua"), F.date_sub(d, 1))
        .when(txt.contains("ngày trước"), F.date_sub(d, n))
        .when(txt.contains("tuần trước"), F.date_sub(d, n * 7))
        .when(
            txt.contains("hôm nay") | txt.contains("vừa xong") | txt.contains("mới đăng"),
            d,
        )
        .otherwise(F.lit(None).cast("date"))
    )


def normalize_text(c: Column | str) -> Column:
    """Join/group key normalization, portable form (lower + trim +
    collapse internal whitespace). Case-insensitive only — for full
    utf8mb4_unicode_ci parity (accent-insensitivity) use
    `collation_key`, which maps to Spark 4 native collations."""
    col = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(F.lower(F.trim(col)), WS_SPLIT, " ")


# Vietnamese + Latin-1 diacritic fold (1:1 translate): every accented
# lowercase form the reference's utf8mb4 job data carries, mapped to
# its base letter. Uppercase is handled by lower() first.
_ACCENTED = (
    "áàảãạăắằẳẵặâấầẩẫậ"
    "éèẻẽẹêếềểễệ"
    "íìỉĩị"
    "óòỏõọôốồổỗộơớờởỡợ"
    "úùủũụưứừửữự"
    "ýỳỷỹỵ"
    "đ"
    "äëïöüÿçñ"
)
_FOLDED = (
    "aaaaaaaaaaaaaaaaa"
    "eeeeeeeeeee"
    "iiiii"
    "ooooooooooooooooo"
    "uuuuuuuuuuu"
    "yyyyy"
    "d"
    "aeiouycn"
)
assert len(_ACCENTED) == len(_FOLDED)


def canonical_key(c: Column | str) -> Column:
    """PLAIN-STRING canonical form of a text key: trim → collapse
    whitespace → lower → fold Vietnamese/Latin diacritics. Binary
    equality of the result matches `collation_key`'s UNICODE_CI_AI
    equality on the reference's data domain (Vietnamese job text +
    Latin-1), and the output is an ordinary STRING — which is what
    makes it a legal BUCKET column (Spark rejects collated types for
    bucketing: INVALID_BUCKET_COLUMN_DATA_TYPE). This is the persisted
    `__nk_*` representation of the bucketed SCD2 warehouse.

    Normalization-form independence (round 9, ADVICE r8): the
    translate table only covers PRECOMPOSED code points, but real
    scraped text can arrive in NFD (base letter + combining marks —
    'e' + U+0301), which ICU equality treats as identical to the NFC
    form. After the fold, any remaining combining diacritical marks
    (U+0300–U+036F — the full Vietnamese/Latin-1 set) are stripped,
    so NFC, NFD and MIXED forms ('ê' + dot-below for 'ệ') all reach
    the same base-letter key instead of splitting one business key
    into two SCD2 rows.

    Contract vs `collation_key`: scripts outside the fold table (full-
    width forms, ligatures, non-Latin accents) fall back to unicode
    case-insensitive-only matching — documented tradeoff of the
    bucketed layout, not a general substitute for ICU collation."""
    col = F.col(c) if isinstance(c, str) else c
    folded = F.translate(
        F.lower(F.regexp_replace(F.trim(col), WS_SPLIT, " ")), _ACCENTED, _FOLDED
    )
    return F.regexp_replace(folded, "[\u0300-\u036f]", "")


def collation_key(c: Column | str, collation: str = "UNICODE_CI_AI") -> Column:
    """utf8mb4_unicode_ci-equivalent comparison key via Spark 4 native
    collations: UNICODE_CI_AI is case- AND accent-insensitive, so
    'Hà Nội' == 'ha noi' in joins/group-bys — the exact semantics the
    reference's tables declare (create_warehouse_db.sql:19) and its
    SCD2 merge relies on (load_to_wh.sh:66-67). Whitespace is
    collapsed first (collation doesn't cover it)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.collate(F.regexp_replace(F.trim(col), WS_SPLIT, " "), collation)
