"""Character-n-gram language identification.

The classic n-gram-profile classifier (Cavnar & Trenkle 1994 "N-Gram-Based
Text Categorization", the textcat/langid.py family): score a document by
how many of each language's characteristic character trigrams it contains,
argmax over languages. Profiles here are small hand-built function-word
trigram tables (public linguistic knowledge — definite articles,
conjunctions, frequent suffixes), which carries real signal on natural
text while staying fully deterministic. Ten languages, including two
non-Latin scripts (Russian Cyrillic, Greek) — the trigram machinery is
byte-agnostic, so scripts cost nothing beyond profile rows.

Engine shape (the part that matters at 100 TB):

* trigram extraction is a JVM higher-order function over the first
  ``PREFIX_CHARS`` characters (profiles saturate quickly; classic langid
  tools truncate the same way) — bounded work per doc;
* the profile is a ~40-row broadcast join, scores are INTEGER sums (exact
  cross-engine, no float rounding anywhere);
* argmax per doc is a (score DESC, lang DESC) row_number window —
  deterministic tie-break;
* docs matching no profile trigram classify as 'unknown' via left join.

No reference analog (the reference has no text operators); part of the
training-data-pipeline surface the build brief makes first-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PREFIX_CHARS = 600

# lang -> {trigram: integer weight}. Spaces are significant (word
# boundaries around function words).
PROFILES: dict[str, dict[str, int]] = {
    "en": {
        " th": 3, "the": 3, "he ": 2, " an": 2, "and": 2, "nd ": 2,
        " of": 2, "of ": 2, " to": 2, "ing": 2, "ng ": 1, " in": 2,
        "ion": 1, "ent": 1, " is": 2, "is ": 1,
    },
    "de": {
        "der": 3, "er ": 1, " de": 2, "die": 3, "ie ": 2, "und": 3,
        " un": 2, "nd ": 1, "ein": 2, " ei": 2, "ich": 2, "ch ": 2,
        "sch": 2, " da": 1, "das": 2, "en ": 2,
    },
    "fr": {
        " le": 3, "le ": 2, "les": 2, " de": 2, "de ": 2, "des": 2,
        " la": 3, "la ": 2, "que": 2, " qu": 1, "ent": 1, "ion": 1,
        " et": 3, "et ": 2, "ais": 1, "eur": 1,
    },
    "es": {
        " el": 3, "el ": 2, " de": 2, "de ": 2, "los": 2, "os ": 2,
        " la": 2, "la ": 2, "que": 2, " qu": 1, "ado": 2, "ión": 1,
        " y ": 3, "ar ": 1, " co": 1, "nte": 1,
    },
    "it": {
        " il": 3, "il ": 2, " di": 3, "di ": 2, "che": 2, " ch": 1,
        "lla": 2, "ell": 2, "zio": 2, "one": 1, " e ": 2, "are": 1,
        "to ": 1, "gli": 2, " pe": 1, "per": 1,
    },
    "pt": {
        " do": 3, "do ": 2, " da": 2, "da ": 2, "ção": 3,
        "ão ": 2, " um": 2, "um ": 1, "os ": 1, " de": 2, "de ": 1,
        "ara": 1, " pa": 1, "com": 1, " co": 1,
    },
    "nl": {
        "het": 3, " he": 1, "een": 2, " ee": 2, "van": 3, " va": 2,
        "aar": 2, "oor": 2, "ijk": 3, "ij ": 2, " ni": 1, "iet": 1,
        "sch": 1, " ge": 2, "cht": 1, "de ": 1,
    },
    "ru": {
        " и ": 3, "ого": 3, "го ": 2, " на": 2, "на ": 1, "ть ": 2,
        "ени": 2, "ние": 2, " по": 2, "ост": 2, "ств": 2, "что": 2,
        " чт": 1, " не": 2, "ет ": 1, "ово": 1,
    },
    "el": {
        " το": 3, "το ": 2, "και": 3, " κα": 2, "αι ": 2, " τη": 2,
        "την": 2, "της": 2, "ης ": 1, "ου ": 2, "ος ": 1, " πα": 1,
        "ειν": 1, "μεν": 1, " δε": 1, "να ": 1,
    },
    "tr": {
        " bi": 2, "bir": 3, "ir ": 1, " ve": 3, "ve ": 2, "lar": 2,
        "ler": 2, "ın ": 2, " ka": 1, "dır": 2, "yor": 2, "or ": 1,
        "ası": 1, "eri": 1, " ol": 2, "lma": 1,
    },
}


def profile_rows() -> list[tuple[str, str, int]]:
    """Flat (trigram, lang, weight) rows, deterministic order."""
    rows = []
    for lang in sorted(PROFILES):
        for tri, w in sorted(PROFILES[lang].items()):
            rows.append((tri, lang, w))
    return rows


def classify(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    prefix_chars: int = PREFIX_CHARS,
) -> DataFrame:
    """(id, guess, score): per-doc argmax language with integer score;
    'unknown' (score 0) when no profile trigram occurs."""
    spark = docs.sparkSession
    prof = F.broadcast(
        spark.createDataFrame(profile_rows(), "tri string, lang string, w int")
    )
    # Stage the lowered prefix as ITS OWN projected column first: referenced
    # inside the transform lambda as a raw expression it would re-lower the
    # 600-char prefix once per trigram (~600x wasted work per doc); as an
    # attribute behind a projection boundary it is computed once per row.
    docs_t = docs.select(
        id_col,
        F.lower(F.substring(F.col(text_col), 1, prefix_chars)).alias("_head"),
    ).select(
        id_col,
        # guard length < 3 explicitly: Spark's sequence(1, 0) yields a
        # DESCENDING [1, 0] (DuckDB's generate_series yields empty), which
        # would emit sub-trigram fragments on short/null texts
        F.expr(
            "CASE WHEN length(_head) >= 3 THEN "
            "transform(sequence(1, length(_head) - 2), "
            "i -> substring(_head, i, 3)) "
            "ELSE array() END"
        ).alias("tris"),
    )
    scored = (
        docs_t.select(id_col, F.explode("tris").alias("tri"))
        .join(prof, "tri")
        .groupBy(id_col, "lang")
        .agg(F.sum("w").alias("score"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.desc("lang"))
    best = (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(id_col, F.col("lang").alias("guess"), "score")
    )
    return (
        docs.select(id_col)
        .join(best, id_col, "left")
        .select(
            id_col,
            F.coalesce("guess", F.lit("unknown")).alias("guess"),
            F.coalesce("score", F.lit(0)).cast("long").alias("score"),
        )
    )


def classify_oracle_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text",
    prefix_chars: int = PREFIX_CHARS,
) -> str:
    """DuckDB re-execution: same profiles (inlined VALUES), same trigram
    extraction, integer scores, same tie-break."""
    values = ",\n      ".join(
        "('{}', '{}', {})".format(tri.replace("'", "''"), lang, w)
        for tri, lang, w in profile_rows()
    )
    head = f"lower(substring({text_col}, 1, {prefix_chars}))"
    return f"""
    WITH prof(tri, lang, w) AS (VALUES
      {values}
    ),
    tris AS (
      SELECT {id_col},
             unnest(list_transform(
               generate_series(1, greatest(len({head}) - 2, 0)),
               i -> substring({head}, i, 3))) AS tri
      FROM {table}
    ),
    scored AS (
      SELECT t.{id_col}, p.lang, CAST(SUM(p.w) AS BIGINT) AS score
      FROM tris t JOIN prof p ON t.tri = p.tri
      GROUP BY t.{id_col}, p.lang
    ),
    best AS (
      SELECT {id_col}, lang AS guess, score,
             row_number() OVER (PARTITION BY {id_col}
                                ORDER BY score DESC, lang DESC) AS rk
      FROM scored
    )
    SELECT d.{id_col},
           COALESCE(b.guess, 'unknown') AS guess,
           CAST(COALESCE(b.score, 0) AS BIGINT) AS score
    FROM {table} d
    LEFT JOIN (SELECT * FROM best WHERE rk = 1) b ON d.{id_col} = b.{id_col}
    """
