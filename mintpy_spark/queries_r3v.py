"""Round-3 additions, batch v: rolling-active engagement, time-in-state
census, and containment near-dup.

* engagement WAU — DAU + EXACT rolling-7-day distinct actives per day
  with a stickiness ratio (the DAU/WAU engagement staple).  Exact
  sliding count-distinct does not decompose into mergeable partials;
  the scale-safe form is the interval-cover explode (x7 bounded fan-out
  per distinct user-day, independent of per-day event volume).
* state dwell census — the TimescaleDB ``state_agg`` analog: time spent
  in each event_type between consecutive events per user (MintPy's
  ``tbase_diff`` acquisition-interval accounting).  Microsecond
  integers end-to-end so the oracle (``epoch_us``) matches exactly.
* containment near-dup — asymmetric |A∩B| / min(|A|,|B|) over
  discriminative word-3-gram shingles (df <= 50, the Broder
  stop-shingle cut): catches quote-inclusion / subset pairs whose
  Jaccard is tiny, the one near-dup family MinHash/SimHash tiers
  structurally miss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mintpy_spark.operators.dedup import (
    containment_near_dups,
    containment_oracle_sql,
)
from mintpy_spark.operators.engagement import daily_actives, state_dwell
from mintpy_spark.queries import _q, load


@_q(
    "engagement_wau_daily",
    """
    WITH ud AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS ed
      FROM events WHERE user_id IS NOT NULL
    ), dau AS (
      SELECT ed, COUNT(*) AS dau FROM ud GROUP BY 1
    ), cover AS (
      SELECT DISTINCT user_id, ed + t.i AS wd
      FROM ud, unnest([0, 1, 2, 3, 4, 5, 6]) AS t(i)
    ), wau AS (
      SELECT wd, COUNT(*) AS wau FROM cover GROUP BY 1
    )
    SELECT CAST(d.ed AS BIGINT) AS ed,
           CAST(d.dau AS BIGINT) AS dau,
           CAST(w.wau AS BIGINT) AS wau,
           CAST(floor(d.dau * 10000.0 / w.wau + 0.5) AS BIGINT)
             AS stickiness_bp
    FROM dau d JOIN wau w ON w.wd = d.ed
    """,
)
def engagement_wau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU, exact trailing-7-day WAU, and stickiness (bp) per active day.
    Plan: distinct (user, day) -> Exchange 1 (volume = distinct
    user-days, not raw events); interval-cover explode (bounded x7) +
    re-distinct -> Exchange 2; two tiny count aggs with map-side
    combine; inner join restricts output to days with direct activity.
    No unbounded window state — this is the mergeable-free exact form."""
    return daily_actives(load(spark, sf_dir, "events"), window=7)


@_q(
    "state_dwell_census",
    """
    WITH e AS (
      SELECT user_id, event_type, event_id, epoch_us(ts) AS us
      FROM events
    ), seg AS (
      SELECT event_type,
             lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
               - us AS dwell
      FROM e
    )
    SELECT event_type AS state,
           CAST(COUNT(*) AS BIGINT) AS entries,
           CAST(SUM(dwell) AS BIGINT) AS total_us,
           CAST(MAX(dwell) AS BIGINT) AS max_us,
           CAST(floor(SUM(dwell) * 1.0 / COUNT(*) + 0.5) AS BIGINT)
             AS mean_us
    FROM seg WHERE dwell IS NOT NULL
    GROUP BY 1
    """,
)
def state_dwell_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-in-state census: per event_type, entries / total / max /
    mean dwell in EXACT integer microseconds, a row's state lasting
    until the same user's next event (last event uncensored, dropped).
    Plan: one Exchange on user_id for the lead() window (sort within
    partitions only), then a |states|-bounded hash agg. Ties on the
    timestamp break on event_id identically in Spark and the oracle."""
    return state_dwell(load(spark, sf_dir, "events"))


@_q("dedup_containment", containment_oracle_sql())
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment near-dup pairs: |A∩B| / min(|A|,|B|) >= 50 % over
    df<=50 discriminative word-3-gram shingles — the asymmetric
    quote-inclusion detector Jaccard LSH misses. Plan: postings + df cut
    co-located on one shingle Exchange; inverted-index pair generation
    bounded by max_df x |postings| (the df cap IS the semantics:
    ubiquitous shingles carry no dup signal and are what makes naive
    pair counting quadratic); pair hash agg; two joins against sizes."""
    return containment_near_dups(load(spark, sf_dir, "documents"))
