"""Text Column expressions: chunking + corpus-analysis primitives.

Chunking re-expresses the reference's fixed-size character chunker
(reference src/vectordb/rag.py:17-24) as a generated array + ``posexplode`` —
one row in, N rows out, fully JVM-side (a UDTF shape with no Python UDTF).

The analysis functions (token count, quality score, language ID, fingerprint)
are the training-data-pipeline extensions: all pure Catalyst expressions so
they run inside whole-stage codegen over a 100 TB corpus scan with no Python
hop and full column pruning.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_CHUNK_SIZE = 300  # reference rag.py:31


def _col(v: Column | str) -> Column:
    return F.col(v) if isinstance(v, str) else v


def _bind(expr: Column, fn) -> Column:
    """Evaluate ``expr`` ONCE and pass it to ``fn`` as a lambda-bound variable.

    Higher-order-function lambdas re-evaluate any captured outer expression per
    array element (Catalyst inlines it), so e.g. shingling over
    ``normalized_text(...)`` would re-run two regexes per shingle — measured
    ~50x slower at sf0.1. Wrapping the expensive expression in a one-element
    array and binding it through ``transform`` forces single evaluation."""
    return F.get(F.transform(F.array(expr), fn), 0)


def chunk_array(text: Column | str, chunk_size: int = DEFAULT_CHUNK_SIZE) -> Column:
    """``[text[i:i+cs] for i in range(0, len(text), cs)]`` with the reference's
    empty-text edge: ``"" -> [""]`` (reference rag.py:17-24).

    ``greatest(1, ceil(len/cs))`` yields one empty chunk for empty text, which
    ``substr('', 1, cs) = ''`` satisfies — no special-case branch needed.
    """
    t = _col(text)
    n_chunks = F.greatest(F.lit(1), F.ceil(F.length(t) / F.lit(float(chunk_size))))
    return F.transform(
        F.sequence(F.lit(0).cast("long"), (n_chunks - 1).cast("long")),
        lambda i: t.substr(
            (i * chunk_size + 1).cast("int"), F.lit(chunk_size)
        ),
    )


# ---------------------------------------------------------------------------
# Training-data-pipeline text analysis (extensions; SURVEY.md §2.6 A3 et al.)
# ---------------------------------------------------------------------------

#: Small multilingual stopword sample used by the quality heuristic.
STOPWORDS = (
    "the a an and or of to in is are was for on with as at by this that "
    "el la de que y en un una es "
    "der die das und ist ein eine "
    "le la les de et un une est "
    "的 是 在 和 了"
).split()


def token_count(text: Column | str) -> Column:
    """Whitespace token count (``split`` on runs of whitespace).

    ``split`` returns ``['']`` for empty input, so empty/blank text counts 0.
    """
    t = F.trim(_col(text))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def bpe_ish_token_count(text: Column | str) -> Column:
    """Sub-word-ish token count: splits on word/number/punctuation boundaries
    (a BPE-flavored regex — counts letter runs, digit runs, and punctuation
    marks separately), a cheap stand-in for a real tokenizer at corpus scale."""
    t = _col(text)
    toks = F.regexp_extract_all(t, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    return F.size(toks)


def alpha_ratio(text: Column | str) -> Column:
    """Fraction of characters that are ASCII letters or spaces."""
    t = _col(text)
    stripped = F.regexp_replace(t, "[^A-Za-z ]", "")
    return F.when(F.length(t) == 0, F.lit(0.0)).otherwise(
        F.length(stripped).cast("double") / F.length(t).cast("double")
    )


def stopword_ratio(text: Column | str) -> Column:
    """Fraction of whitespace tokens that are stopwords (lower-cased)."""
    t = _col(text)
    toks = F.split(F.lower(F.trim(t)), r"\s+")
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda w: w.isin(*STOPWORDS)))
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        hits.cast("double") / n.cast("double")
    )


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic: mean of (alpha ratio, stopword
    presence, length-band membership). Deliberately simple + deterministic —
    the shape of a Gopher/C4-style quality filter, expressible as one
    codegen'd expression."""
    t = _col(text)
    len_ok = ((F.length(t) >= 50) & (F.length(t) <= 10_000)).cast("double")
    return (alpha_ratio(t) + stopword_ratio(t) + len_ok) / F.lit(3.0)


#: (language, marker-token) pairs for the n-gram language-ID heuristic.
LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "to"],
    "es": ["el", "la", "que", "de", "es"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "les", "est", "une", "et"],
    "zh": ["的", "是", "在", "了", "和"],
}


def lang_id(text: Column | str) -> Column:
    """Marker-token language ID: score each language by how many of its marker
    tokens appear, pick the argmax (ties broken by language-name order via
    max-struct). Returns ``und`` when no marker hits."""
    toks = F.split(F.lower(F.trim(_col(text))), r"\s+")

    def _pred(markers):
        # closure (not a default arg: F.filter's 2-arg form receives an index)
        return lambda w: w.isin(*markers)

    scored = F.array(
        *[
            F.struct(
                F.size(F.filter(toks, _pred(markers))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
            for lang, markers in sorted(LANG_MARKERS.items(), reverse=True)
        ]
    )
    best = F.array_max(scored)
    return F.when(best["hits"] <= 0, F.lit("und")).otherwise(best["lang"])


def fingerprint64(text: Column | str) -> Column:
    """64-bit document fingerprint: first 15 hex digits of md5, as a BIGINT.

    Stable across engines (md5 is standardized), usable as a cheap
    content-equality key for exact dedup at scale. 60 bits of hash."""
    return F.conv(F.substring(F.md5(_col(text)), 1, 15), 16, 10).cast("long")


def normalized_text(text: Column | str) -> Column:
    """Canonical form for near-dup hashing: lower-case, collapse whitespace,
    strip punctuation."""
    t = F.lower(_col(text))
    t = F.regexp_replace(t, r"[^a-z0-9\s]", " ")
    return F.trim(F.regexp_replace(t, r"\s+", " "))


#: Rolling-hash constants (Rabin–Karp style polynomial fold). All arithmetic
#: stays below 2^39 so int64 is exact on every engine.
ROLLING_B = 131
ROLLING_P = 2_147_483_647


def rolling_fingerprint(text: Column | str) -> Column:
    """Order-sensitive document fingerprint: polynomial rolling hash over the
    normalized token stream, ``h = fold(tokens, 0, (acc,t) -> (acc*B +
    hash30(t)) mod P)``.

    Unlike the set-based md5 fingerprint (:func:`fingerprint64`), this is
    sensitive to token ORDER — two docs with the same words shuffled get
    different fingerprints — which is what content-defined chunking / shift-
    resistant dedup pipelines key on. ``hash30`` is the first 60 bits of
    md5 mod 2^30 (the cross-engine primitive), the fold is exact int64, so a
    SQL oracle reproduces it bit-for-bit."""
    toks = F.split(normalized_text(text), " ")
    h30 = lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long") % F.lit(
        1 << 30
    )
    return _bind(
        F.transform(toks, h30),
        lambda hs: F.aggregate(
            hs,
            F.lit(0).cast("long"),
            lambda acc, h: (acc * F.lit(ROLLING_B) + h) % F.lit(ROLLING_P),
        ),
    )


def char_shingles(text: Column | str, k: int = 5) -> Column:
    """Array of k-character shingles of the normalized text (distinct).

    One ``transform`` over start offsets — stays JVM-side; for a 100 TB corpus
    this is the map-side of MinHash and never touches Python."""
    return _bind(
        normalized_text(text),
        # NULL text: length(NULL) is NULL but greatest() IGNORES nulls, so the
        # sequence still yields [1] and substr(NULL,..) makes a [NULL] array —
        # filter null shingles out so a NULL doc degrades to [] (empty doc)
        lambda t: F.array_distinct(
            F.filter(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.greatest(F.lit(1), F.length(t) - F.lit(k - 1)).cast("int"),
                    ),
                    lambda i: t.substr(i, F.lit(k)),
                ),
                lambda s: s.isNotNull(),
            )
        ),
    )


def word_ngrams_all(text: Column | str, n: int = 2) -> Column:
    """Array of word n-grams of the normalized text, one entry PER
    OCCURRENCE (unlike :func:`word_ngrams`, which de-duplicates for
    set-similarity). Repetition-quality signals (Gopher-style top-n-gram
    and duplicate-n-gram fractions) need the multiplicities."""
    return _bind(
        F.split(normalized_text(text), " "),
        lambda toks: F.transform(
            F.sequence(
                F.lit(0),
                (F.greatest(F.lit(1), F.size(toks) - F.lit(n - 1)) - 1).cast("int"),
            ),
            lambda i: F.concat_ws(
                " ",
                *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)],
            ),
        ),
    )


def word_ngrams(text: Column | str, n: int = 3) -> Column:
    """Array of word n-grams (distinct) of the normalized text."""
    return _bind(
        F.split(normalized_text(text), " "),
        lambda toks: F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(0),
                    (F.greatest(F.lit(1), F.size(toks) - F.lit(n - 1)) - 1).cast("int"),
                ),
                lambda i: F.concat_ws(
                    " ",
                    *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)],
                ),
            )
        ),
    )
