"""The sorted/range-partitioned suffix pair generator must produce the same
connectivity as the grouped one (SURVEY.md O1/W3/J7)."""

from __future__ import annotations

from dedup.config import DedupConfig
from dedup.suffix import suffix_candidates, suffix_candidates_sorted

from .oracle import clusters_from_pairs


def _components(all_ids, pairs):
    return clusters_from_pairs(all_ids, pairs)


def test_sorted_variant_same_components(spark):
    cfg = DedupConfig(shuffle_partitions=8)
    rows = [
        ("c1", [10, 11, 12]),
        ("c2", [12, 50]),        # shares fp 12 with c1
        ("c3", [50, 99]),        # shares fp 50 with c2
        ("c4", [7]),             # isolated
        ("c5", [99]),            # shares fp 99 with c3
        ("c6", []),              # empty
    ]
    df = spark.createDataFrame(rows, "conv_id string, suffix_fps array<long>")
    grouped = [(r["a"], r["b"]) for r in suffix_candidates(df, cfg).collect()]
    srt = [(r["a"], r["b"]) for r in suffix_candidates_sorted(df, cfg, partitions=4).collect()]
    ids = [r[0] for r in rows]
    assert _components(ids, grouped) == _components(ids, srt)
    comp = _components(ids, srt)
    assert comp["c1"] == comp["c2"] == comp["c3"] == comp["c5"]
    assert comp["c4"] == "c4" and comp["c6"] == "c6"


def test_sorted_variant_boundary_fixup(spark):
    """Force many range partitions so equal-fp runs straddle boundaries."""
    cfg = DedupConfig(shuffle_partitions=8)
    # 40 convs all sharing fingerprint 5 → one chain even across partitions
    rows = [(f"c{i:02d}", [5]) for i in range(40)]
    df = spark.createDataFrame(rows, "conv_id string, suffix_fps array<long>")
    pairs = [(r["a"], r["b"]) for r in suffix_candidates_sorted(df, cfg, partitions=8).collect()]
    comp = _components([r[0] for r in rows], pairs)
    assert set(comp.values()) == {"c00"}
