"""Name normalization + fuzzy scoring — the heart of entity blocking/linking.

The reference delegates to the public `nypl-registry-utils-normalize` npm
package (monkey-patches a `string_score`-style fuzzy scorer onto String):

- `normalize.normalizeAndDiacritics(s)` — blocking key. Behavior evidenced
  by reference fixtures (/root/reference/test/utils.test.js:254,261):
  'Zawidzka-Manteuffel, Wanda, 1906-1994' -> 'zawidzka manteuffel wanda 1906 1994'
  and (:78,157) 'Coooooool Old Guy.' -> 'coooooool old guy'.
  Semantics: Unicode-accent-fold, lowercase, punctuation -> space,
  collapse whitespace, trim.
- `String.prototype.score(other, fuzziness)` — Joshaven Potter's public
  string_score algorithm; drives the top-1 candidate pick
  (/root/reference/lib/utils.js:53-61).
- `normalize.percentOverlap(a, b)` — token-overlap %, stored in
  altForms.poverlap (/root/reference/lib/utils_shadowcat.js:247); 100 for
  identical strings (:401). Only metadata — monotone equivalence suffices.

Determinism note: `normalize_name_py` is the canonical byte-stable
definition (pure `unicodedata` NFD fold + a small explicit table for
non-decomposable letters, no locale dependence); the Spark expression's
translate table is GENERATED from the same fold, so Spark and Python
agree by construction over Basic Latin..Latin Extended-B, bare combining
marks, and Latin Extended Additional (property-swept in
tests/test_normalize.py). DuckDB's strip_accents matches NFD semantics
over that range too, with ONE known exception: U+034F (combining
grapheme joiner, combining class 0) is stripped by DuckDB but folds to
whitespace here — scope NORMALIZE_SQL accordingly.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StringType

_NON_ALNUM = re.compile(r"[^a-z0-9]+")

# Single-char folds for letters NFKD canNOT decompose (no combining mark
# to strip). Multi-char ligature expansions (æ->ae, œ->oe, ß->ss) are NOT
# folded — F.translate is strictly 1:1, so the canonical impl treats them
# as non-alphanumerics (-> space) to stay byte-identical across engines.
_EXTRA_SRC = "øłđıŋ"
_EXTRA_DST = "oldin"
_EXTRA_MAP = str.maketrans(_EXTRA_SRC, _EXTRA_DST)


def _gen_fold_table() -> tuple[str, str]:
    """Generate the JVM translate() table from the canonical NFD fold:
    every Latin-1 Supplement .. Latin Extended Additional (U+00A0..U+1EFF)
    lowercase char whose NFD decomposition strips to a single ASCII
    letter, plus the non-decomposable extras above, plus bare combining
    marks (deleted — translate drops src chars with no dst counterpart),
    so pre-decomposed input ('Nguye'+U+0303+'n') folds identically to
    composed input. Deterministic (pure unicodedata) — the JVM path and
    normalize_name_py agree by CONSTRUCTION, asserted over the whole
    Basic Latin..Latin Extended Additional range by tests/test_normalize.

    NFD (canonical-only), NOT NFKD: compatibility decompositions are
    one-to-many (¼ -> '1⁄4', ª -> 'a'), which a 1:1 translate cannot
    express and DuckDB's strip_accents does not perform either — NFD is
    the semantics all three engines share.
    """
    # Both cases enter the table and translate runs BEFORE lower(): JVM
    # lower() expands 'İ' to 'i' + combining dot, which a post-lower
    # table can never fold back. The fold composes NFD + _EXTRA_MAP so
    # accented non-decomposables (ǿ -> ø -> o) land too. The scan skips
    # the non-Latin blocks between Extended-B and Extended Additional
    # (their chars never NFD-fold to ASCII, so they'd be no-ops anyway).
    src, dst = [], []
    for cp in [*range(0xA0, 0x250), *range(0x1E00, 0x1F00)]:
        ch = chr(cp)
        folded = "".join(
            c for c in unicodedata.normalize("NFD", ch) if not unicodedata.combining(c)
        )
        folded = folded.lower().translate(_EXTRA_MAP)
        if len(folded) == 1 and folded.isascii() and folded.isalnum():
            src.append(ch)
            dst.append(folded)
    # Combining Diacritical Marks (U+0300..U+036F): delete outright, the
    # same thing the canonical Python fold does to a bare combining mark.
    # Criterion is combining()!=0, same as the Python fold — U+034F
    # (COMBINING GRAPHEME JOINER) is class 0 and folds to space in both.
    src.extend(
        chr(cp) for cp in range(0x300, 0x370) if unicodedata.combining(chr(cp))
    )
    return "".join(src), "".join(dst)


_FOLD_SRC, _FOLD_DST = _gen_fold_table()


# ---------------------------------------------------------------------------
# X1 — normalize / blocking key
# ---------------------------------------------------------------------------
def normalize_name_py(s: str | None) -> str | None:
    """Canonical byte-stable normalization (driver/oracle reference impl)."""
    if s is None:
        return None
    # NFD-decompose (canonical only — see _gen_fold_table for why not
    # NFKD), drop combining marks (accent folding).
    folded = "".join(
        ch for ch in unicodedata.normalize("NFD", s) if not unicodedata.combining(ch)
    )
    return _NON_ALNUM.sub(" ", folded.lower().translate(_EXTRA_MAP)).strip()


@pandas_udf(StringType())
def normalize_name_udf(s: pd.Series) -> pd.Series:
    """Arrow-vectorized normalization. Use when input may carry diacritics."""
    return s.map(normalize_name_py, na_action="ignore")


def normalize_name_expr(col: Column) -> Column:
    """JVM-side fast path (whole-stage codegen), byte-identical to
    normalize_name_py over the full Latin-1..Latin Extended Additional
    range (and for bare combining marks): the translate table is
    GENERATED from the same NFD fold (see _gen_fold_table), so the two
    impls cannot drift. Chars outside the table fold to whitespace in
    both (same as punctuation).

    Keep this in the hot path: ~10-50x cheaper than the pandas UDF.
    """
    folded = F.lower(F.translate(col, _FOLD_SRC, _FOLD_DST))
    return F.trim(F.regexp_replace(folded, r"[^a-z0-9]+", " "))


# DuckDB-equivalent SQL fragment (for oracle_sql parity checks): DuckDB's
# strip_accents is NFD-equivalent for the decomposable range (swept in
# this module's tests; sole divergence U+034F, see module docstring); the
# extras need the same explicit translate.
NORMALIZE_SQL = (
    "trim(regexp_replace(translate(lower(strip_accents({col})), "
    f"'{_EXTRA_SRC}', '{_EXTRA_DST}'), '[^a-z0-9]+', ' ', 'g'))"
)


# ---------------------------------------------------------------------------
# X3 — string_score fuzzy similarity (public algorithm, Joshaven Potter)
# ---------------------------------------------------------------------------
def fuzzy_score_py(target: str | None, query: str | None, fuzziness: float = 0.5) -> float:
    """Exact reimplementation of the string_score algorithm the reference
    calls as `target.score(query, 0.5)` (/root/reference/lib/utils.js:56).

    Returns 1.0 for identical strings, 0.0 for empty query; otherwise a
    char-walk score with consecutive/acronym/same-case bonuses and a
    fuzzy-miss penalty divisor.
    """
    if target is None or query is None:
        return 0.0
    if target == query:
        return 1.0
    if query == "":
        return 0.0

    l_target = target.lower()
    l_query = query.lower()
    running = 0.0
    start_at = 0
    fuzzies = 1.0
    fuzzy_factor = 1.0 - fuzziness

    for i, qc in enumerate(l_query):
        idx = l_target.find(qc, start_at)
        if idx == -1:
            fuzzies += fuzzy_factor
        else:
            if start_at == idx:
                char_score = 0.7  # consecutive / start-of-string bonus
            else:
                char_score = 0.1
                if target[idx - 1] == " ":
                    char_score += 0.8  # acronym bonus
            if target[idx] == query[i]:
                char_score += 0.1  # same-case bonus
            running += char_score
            start_at = idx + 1

    final = 0.5 * (running / len(target) + running / len(query)) / fuzzies
    if l_query[0] == l_target[0] and final < 0.85:
        final += 0.15
    return final


@pandas_udf(DoubleType())
def fuzzy_score_udf(target: pd.Series, query: pd.Series) -> pd.Series:
    """Arrow-batched fuzzy scorer (fuzziness pinned to the reference's 0.5)."""
    return pd.Series(
        [fuzzy_score_py(t, q) for t, q in zip(target, query)], dtype="float64"
    )


def fuzzy_score_expr(target: Column, query: Column) -> Column:
    """string_score as a PURE JVM expression — F.aggregate over query
    positions with a (running, start_at, fuzzies) struct accumulator,
    exactly the fuzzy_score_py char-walk (parity-swept in
    tests/test_normalize.py).

    This is the production path: it keeps the linking cascade free of
    Python workers entirely (worker init is seconds per executor slot
    here and the scorer sits on the J4 hot path at 100 TB). The pandas
    UDF above remains as the Arrow reference implementation.

    ARG CONTRACT: pass CHEAP column references (concrete columns or
    struct fields), never expression trees. Higher-order functions are
    interpreted (no codegen, no common-subexpression elimination), and
    the walk references target/query ~4x PER STEP — an inlined
    regexp/normalize argument re-executes ~80x per row. Pre-project
    expensive args behind an exchange (see merge.score_alt_forms), or
    better, compute block-constant scores on the dimension side
    (see linking's name_best).
    """
    t, q = target, query
    lt, lq = F.lower(t), F.lower(q)

    def step(a, i):
        # pos = 1-based find of query char i in lt from offset a.s (0 = miss);
        # consecutive-match <=> pos == a.s + 1; 0-based hit idx = pos - 1.
        pos = F.position(F.substr(lq, i, F.lit(1)), lt, a["s"] + 1)
        char_score = (
            F.when(pos == a["s"] + 1, F.lit(0.7)).otherwise(
                F.lit(0.1)
                + F.when(F.substr(t, pos - 1, F.lit(1)) == " ", 0.8).otherwise(0.0)
            )
            + F.when(F.substr(t, pos, F.lit(1)) == F.substr(q, i, F.lit(1)), 0.1)
            .otherwise(0.0)
        )
        return F.struct(
            F.when(pos == 0, a["r"]).otherwise(a["r"] + char_score).alias("r"),
            F.when(pos == 0, a["s"]).otherwise(pos).alias("s"),
            F.when(pos == 0, a["f"] + 0.5).otherwise(a["f"]).alias("f"),
        )

    acc = F.aggregate(
        F.sequence(F.lit(1), F.length(q)),
        F.struct(F.lit(0.0).alias("r"), F.lit(0).alias("s"), F.lit(1.0).alias("f")),
        step,
    )
    final = 0.5 * (acc["r"] / F.length(t) + acc["r"] / F.length(q)) / acc["f"]
    scored = F.when(
        (F.substring(lq, 1, 1) == F.substring(lt, 1, 1)) & (final < 0.85),
        final + 0.15,
    ).otherwise(final)
    return (
        F.when(t.isNull() | q.isNull(), F.lit(0.0))
        .when(t == q, F.lit(1.0))
        .when(F.length(q) == 0, F.lit(0.0))
        .otherwise(scored)
    )


# ---------------------------------------------------------------------------
# X2 — percentOverlap
# ---------------------------------------------------------------------------
def percent_overlap_py(a: str | None, b: str | None) -> float:
    """Token-overlap percentage; 100.0 for identical strings (matching the
    reference's trivial case, /root/reference/lib/utils_shadowcat.js:401)."""
    if a is None or b is None:
        return 0.0
    if a == b:
        return 100.0
    ta, tb = set(a.split()), set(b.split())
    if not ta or not tb:
        return 0.0
    return 100.0 * len(ta & tb) / max(len(ta), len(tb))


@pandas_udf(DoubleType())
def percent_overlap_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([percent_overlap_py(x, y) for x, y in zip(a, b)], dtype="float64")


def percent_overlap_expr(a: Column, b: Column) -> Column:
    """percentOverlap as pure Column expressions (JVM path; the pandas UDF
    above is the Arrow reference implementation)."""

    def toks(c: Column) -> Column:
        # array_remove('') matches Python str.split()'s empty-run handling
        return F.array_remove(F.array_distinct(F.split(c, " ")), "")

    ta, tb = toks(a), toks(b)
    return (
        F.when(a.isNull() | b.isNull(), F.lit(0.0))
        .when(a == b, F.lit(100.0))
        .when((F.size(ta) == 0) | (F.size(tb) == 0), F.lit(0.0))
        .otherwise(
            100.0
            * F.size(F.array_intersect(ta, tb))
            / F.greatest(F.size(ta), F.size(tb))
        )
    )
