"""threshold_sweep — pair-classification P/R/F1 over a threshold grid:
hand-computed fixture incl. blocked-away truth (FN at every t), NULL
scores never matching, grid dedup/sort, and validation."""

import pytest

from datamatch_spark.metrics import threshold_sweep

SCORED = [
    # (idx_a, idx_b, score); truth = {(0,1), (2,3), (8,9)}
    (0, 1, 0.9),   # true, high
    (2, 3, 0.6),   # true, mid
    (4, 5, 0.7),   # false, mid
    (6, 7, None),  # false, refused -> never predicted
]
TRUTH = [(0, 1), (2, 3), (8, 9)]  # (8,9) never scored: blocked away


def _frames(spark):
    return (
        spark.createDataFrame(SCORED, "idx_a long, idx_b long, sim_score double"),
        spark.createDataFrame(TRUTH, "idx_a long, idx_b long"),
    )


def _expected(t):
    tp = sum(1 for a, b, s in SCORED if s is not None and s >= t and (a, b) in TRUTH)
    fp = sum(1 for a, b, s in SCORED if s is not None and s >= t and (a, b) not in TRUTH)
    fn = len(TRUTH) - tp
    return tp, fp, fn


def test_hand_computed_grid(spark):
    scored, truth = _frames(spark)
    out = {
        r["threshold"]: r
        for r in threshold_sweep(scored, truth, [0.5, 0.65, 0.8, 0.95]).collect()
    }
    assert set(out) == {0.5, 0.65, 0.8, 0.95}
    for t in out:
        tp, fp, fn = _expected(t)
        r = out[t]
        assert (r["tp"], r["fp"], r["fn"]) == (tp, fp, fn), t
    # spot values: at 0.5 both true scored pairs + 1 fp; (8,9) always fn
    assert (out[0.5]["tp"], out[0.5]["fp"], out[0.5]["fn"]) == (2, 1, 1)
    assert out[0.5]["precision"] == pytest.approx(2 / 3)
    assert out[0.5]["recall"] == pytest.approx(2 / 3)
    # at 0.95: nothing predicted -> precision NULL, recall 0
    assert out[0.95]["tp"] == 0 and out[0.95]["precision"] is None
    assert out[0.95]["recall"] == pytest.approx(0.0)


def test_grid_dedup_and_validation(spark):
    scored, truth = _frames(spark)
    assert threshold_sweep(scored, truth, [0.5, 0.5, 0.5]).count() == 1
    with pytest.raises(ValueError):
        threshold_sweep(scored, truth, [])
    with pytest.raises(KeyError):
        threshold_sweep(scored.drop("sim_score"), truth, [0.5])
