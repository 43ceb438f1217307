"""pairwise_f1 / bcubed cluster-evaluation metrics: hand-computed
contingency fixtures, perfect/disjoint edge cases, NULL-label and
unlabeled-row exclusion, numpy cross-check on a random labeling, and
validation. North-rule tie-in: pairwise F1 is the acceptance metric
("pairwise F1 >= 0.99 on labeled pairs")."""

import itertools

import pytest
from pyspark.sql import functions as F

from datamatch_spark.metrics import bcubed, pairwise_f1


def _frames(spark, labels):
    """labels: list of (id, pred, truth)."""
    df = spark.createDataFrame(labels, "id long, p string, t string")
    return (
        df.select("id", F.col("p").alias("group_id")),
        df.select("id", F.col("t").alias("true_id")),
    )


def _brute(labels):
    """Reference pairwise counts over explicit pairs."""
    lab = [(i, p, t) for i, p, t in labels if p is not None and t is not None]
    pred = {frozenset((a[0], b[0])) for a, b in itertools.combinations(lab, 2) if a[1] == b[1]}
    true = {frozenset((a[0], b[0])) for a, b in itertools.combinations(lab, 2) if a[2] == b[2]}
    return len(pred), len(true), len(pred & true)


LABELS = [
    (0, "x", "g1"),
    (1, "x", "g1"),
    (2, "x", "g2"),
    (3, "y", "g2"),
    (4, "y", "g2"),
    (5, "z", "g3"),
]


def test_pairwise_hand_computed(spark):
    pred, truth = _frames(spark, LABELS)
    row = pairwise_f1(pred, truth, "id").collect()[0]
    bp, bt, bc = _brute(LABELS)
    assert (row["pred_pairs"], row["true_pairs"], row["common_pairs"]) == (bp, bt, bc)
    # pred pairs: x C(3,2)=3, y C(2,2)=1 -> 4; true: g1 1 + g2 3 -> 4; common: {0,1},{3,4} -> 2
    assert (bp, bt, bc) == (4, 4, 2)
    assert row["precision"] == pytest.approx(0.5)
    assert row["recall"] == pytest.approx(0.5)
    assert row["f1"] == pytest.approx(0.5)


def test_bcubed_hand_computed(spark):
    pred, truth = _frames(spark, LABELS)
    row = bcubed(pred, truth, "id").collect()[0]
    # per-row precision: ids 0,1: 2/3; 2: 1/3; 3,4: 2/2; 5: 1/1
    exp_p = (2 / 3 + 2 / 3 + 1 / 3 + 1 + 1 + 1) / 6
    # per-row recall: 0,1: 2/2; 2: 1/3; 3,4: 2/3; 5: 1/1
    exp_r = (1 + 1 + 1 / 3 + 2 / 3 + 2 / 3 + 1) / 6
    assert row["n_rows"] == 6
    assert row["bcubed_precision"] == pytest.approx(exp_p)
    assert row["bcubed_recall"] == pytest.approx(exp_r)
    assert row["bcubed_f1"] == pytest.approx(2 * exp_p * exp_r / (exp_p + exp_r))


def test_perfect_and_disjoint(spark):
    perfect = [(i, f"c{i % 2}", f"c{i % 2}") for i in range(6)]
    pred, truth = _frames(spark, perfect)
    row = pairwise_f1(pred, truth, "id").collect()[0]
    assert row["f1"] == pytest.approx(1.0)
    assert bcubed(pred, truth, "id").collect()[0]["bcubed_f1"] == pytest.approx(1.0)

    # all-singleton prediction: zero pred pairs -> precision/f1 NULL
    singles = [(i, f"s{i}", "one") for i in range(4)]
    pred, truth = _frames(spark, singles)
    row = pairwise_f1(pred, truth, "id").collect()[0]
    assert row["pred_pairs"] == 0 and row["true_pairs"] == 6
    assert row["precision"] is None and row["f1"] is None
    assert row["recall"] == pytest.approx(0.0)


def test_null_labels_and_unlabeled_rows_excluded(spark):
    labels = LABELS + [(6, None, "g3"), (7, "z", None)]
    pred, truth = _frames(spark, labels)
    base = pairwise_f1(*_frames(spark, LABELS), "id").collect()[0]
    # NULL pred/truth rows assert nothing for THEIR side's pairs but
    # pairwise counts require both labels: brute force agrees
    row = pairwise_f1(pred, truth, "id").collect()[0]
    bp, bt, bc = _brute(labels)
    assert (row["pred_pairs"], row["true_pairs"], row["common_pairs"]) == (bp, bt, bc)
    # a row present only in pred is dropped by the inner join
    pred2 = pred.unionByName(
        pred.sparkSession.createDataFrame([(99, "x")], "id long, group_id string")
    )
    row2 = pairwise_f1(pred2, truth, "id").collect()[0]
    assert row2 == row
    del base


def test_random_numpy_crosscheck(spark):
    import random

    rng = random.Random(7)
    labels = [
        (i, f"p{rng.randrange(5)}", f"t{rng.randrange(4)}") for i in range(120)
    ]
    pred, truth = _frames(spark, labels)
    row = pairwise_f1(pred, truth, "id").collect()[0]
    bp, bt, bc = _brute(labels)
    assert (row["pred_pairs"], row["true_pairs"], row["common_pairs"]) == (bp, bt, bc)
    # bcubed cross-check per-row
    b = bcubed(pred, truth, "id").collect()[0]
    from collections import Counter

    np_, nt, cell = Counter(), Counter(), Counter()
    for _, p, t in labels:
        np_[p] += 1
        nt[t] += 1
        cell[(p, t)] += 1
    n = len(labels)
    exp_p = sum(c * c / np_[p] for (p, t), c in cell.items()) / n
    exp_r = sum(c * c / nt[t] for (p, t), c in cell.items()) / n
    assert b["bcubed_precision"] == pytest.approx(exp_p)
    assert b["bcubed_recall"] == pytest.approx(exp_r)


def test_validation(spark):
    pred, truth = _frames(spark, LABELS)
    with pytest.raises(KeyError):
        pairwise_f1(pred.drop("group_id"), truth, "id")
    with pytest.raises(KeyError):
        bcubed(pred, truth.drop("true_id"), "id")
    with pytest.raises(KeyError):
        pairwise_f1(pred, truth.drop("id"), "id")
    with pytest.raises(ValueError):
        pairwise_f1(
            pred, truth.withColumnRenamed("true_id", "group_id"),
            "id", truth_col="group_id",
        )
