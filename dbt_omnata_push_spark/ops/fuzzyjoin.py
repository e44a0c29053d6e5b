"""Edit-distance fuzzy join: PassJoin-style segment blocking + exact
Levenshtein verify.

The record-linkage/data-cleaning join (near-identical names, typo'd
keys) that naive engines run as an all-pairs Levenshtein — O(n^2)
distance evaluations. The sound blocking scheme (Li et al., PassJoin):
partition each left string into ``max_dist + 1`` contiguous segments;
if ed(s, t) <= max_dist, pigeonhole says at least one segment is
untouched by every edit and therefore appears in t VERBATIM, at a
start position shifted by at most the net insertions/deletions before
it (<= max_dist). So candidates = an EQUI-JOIN on
(length-group, segment-index, segment-content) between left segments
and right substrings sampled at the +-max_dist window — never a cross
join — and the exact Levenshtein runs only on candidates. Blocking is
LOSSLESS: the oracle-equality of the all-pairs definition is the
soundness proof, re-checked on real data every round.

Scale shape: the left side emits max_dist+1 rows per string; the right
side emits (2*max_dist + 1) * (max_dist + 1) substrings per string per
left length group (length groups collected to the driver — bounded by
string-length diversity, like the kmeans centroid loop). Both sides
are map-side explodes into one hash equi-join on the segment content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _segments(length: int, k: int) -> list[tuple[int, int]]:
    """(start, len) 1-based contiguous segmentation of ``length`` into
    ``k`` parts, earlier parts shorter (deterministic)."""
    base, extra = divmod(length, k)
    out, pos = [], 1
    for i in range(k):
        seg_len = base + (1 if i >= k - extra else 0)
        out.append((pos, seg_len))
        pos += seg_len
    return out


def fuzzy_self_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 2,
) -> DataFrame:
    """Pairs (id_a < id_b) with levenshtein(str_a, str_b) <= max_dist.

    Returns (id_a, id_b, dist). Exactly equivalent to the all-pairs
    filter (the blocking only prunes); the segment equi-join keeps the
    candidate set near-linear for realistic typo distributions.
    """
    k = max_dist + 1
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(str_col).alias("_s"),
        F.length(str_col).alias("_len"),
    )
    lengths = [r["_len"] for r in base.select("_len").distinct().collect()]

    # Left probe rows: the k segments of each string.
    seg_rows = []
    for L in lengths:
        for i, (start, seg_len) in enumerate(_segments(L, k)):
            if seg_len == 0:
                continue
            seg_rows.append((L, i, start, seg_len))
    probe = None
    for L, i, start, seg_len in seg_rows:
        part = base.filter(F.col("_len") == L).select(
            "_id",
            "_s",
            "_len",
            F.lit(i).alias("_seg"),
            F.substring("_s", start, seg_len).alias("_content"),
            F.lit(L).alias("_lgroup"),
        )
        probe = part if probe is None else probe.unionByName(part)

    # Right index rows: substrings at the shifted window for each left
    # length group a right string could match (|len diff| <= max_dist).
    index = None
    for L, i, start, seg_len in seg_rows:
        for shift in range(-max_dist, max_dist + 1):
            s2 = start + shift
            if s2 < 1:
                continue
            part = (
                base.filter(
                    (F.col("_len") >= L - max_dist)
                    & (F.col("_len") <= L + max_dist)
                    & (F.col("_len") >= s2 + seg_len - 1)
                )
                .select(
                    F.col("_id").alias("_idb"),
                    F.col("_s").alias("_sb"),
                    F.lit(i).alias("_seg"),
                    F.substring("_s", s2, seg_len).alias("_content"),
                    F.lit(L).alias("_lgroup"),
                )
            )
            index = part if index is None else index.unionByName(part)

    cand = (
        probe.join(index, ["_lgroup", "_seg", "_content"])
        .filter(F.col("_id") < F.col("_idb"))
        .select(
            F.col("_id").alias("id_a"),
            F.col("_idb").alias("id_b"),
            F.col("_s").alias("_sa"),
            F.col("_sb").alias("_sb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("_sa", "_sb"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "dist")
    )
